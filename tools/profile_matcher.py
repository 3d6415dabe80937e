"""Matcher roofline profile (VERDICT r4 weak #6 / task #8).

Times the fused bf16 match kernel against ablated variants on the real
TPU to attribute the gap to MXU vs VPU:

* full      — production l2_top2_block_pallas (matmul + top-2 merge)
* mm_only   — same tiling, matmul + single store (no top-2): MXU ceiling
* min_only  — matmul + one min pass (no argmin / second-min)

Prints one JSON line with pairs/s per variant plus the derived roofline
attribution; paste into PARITY.md.

Run (TPU): python tools/profile_matcher.py [--n 4096] [--d 256] [--pairs 64]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regard3d_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from regard3d_tpu.kernels import match as match_mod  # noqa: E402

_BIG = float(3.0e38)


def _ablate_kernel(mode):
    """Variant of _match_block_kernel with the top-2 merge ablated."""

    def kern(pairs_ref, a_ref, b_ref, bnorm_ref,
             d1_ref, i1_ref, d2_ref, acc_d1, acc_i1, acc_d2):
        j = pl.program_id(2)
        nb = pl.num_programs(2)

        @pl.when(j == 0)
        def _init():
            acc_d1[:] = jnp.full_like(acc_d1, _BIG)
            acc_i1[:] = jnp.zeros_like(acc_i1)
            acc_d2[:] = jnp.full_like(acc_d2, _BIG)

        a = a_ref[0]
        b = b_ref[0]
        prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        ab = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=prec)
        if mode == "mm_only":
            # keep the matmul live with a cheap per-row store
            acc_d1[:, 0] = jnp.minimum(acc_d1[:, 0], ab[:, 0])
        elif mode == "min_only":
            d_tile = bnorm_ref[0] - 2.0 * ab
            acc_d1[:, 0] = jnp.minimum(acc_d1[:, 0], jnp.min(d_tile, axis=1))
        else:
            raise ValueError(mode)

        @pl.when(j == nb - 1)
        def _flush():
            d1_ref[0, :, 0] = acc_d1[:, 0]
            i1_ref[0, :, 0] = acc_i1[:, 0]
            d2_ref[0, :, 0] = acc_d2[:, 0]

    return kern


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "mode"))
def _ablated_block(desc, mask, pairs, tile_m, tile_n, mode):
    B, N, D = desc.shape
    P = pairs.shape[0]
    bnorm = jnp.where(mask, jnp.sum(desc.astype(jnp.float32) ** 2, -1),
                      _BIG)[:, None, :]
    grid = (P, N // tile_m, N // tile_n)
    out = pl.pallas_call(
        _ablate_kernel(mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_m, D),
                             lambda p, i, j, pr: (pr[p, 0], i, 0)),
                pl.BlockSpec((1, tile_n, D),
                             lambda p, i, j, pr: (pr[p, 1], j, 0)),
                pl.BlockSpec((1, 1, tile_n),
                             lambda p, i, j, pr: (pr[p, 1], 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m, 1), lambda p, i, j, pr: (p, i, 0)),
                pl.BlockSpec((1, tile_m, 1), lambda p, i, j, pr: (p, i, 0)),
                pl.BlockSpec((1, tile_m, 1), lambda p, i, j, pr: (p, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_m, 1), jnp.float32),
                pltpu.VMEM((tile_m, 1), jnp.int32),
                pltpu.VMEM((tile_m, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, N, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(pairs, desc.astype(jnp.bfloat16), desc.astype(jnp.bfloat16), bnorm)
    return out[0][..., 0]


def _time(fn, reps=5):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.random((args.b, args.n, args.d), np.float32))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    mask = jnp.ones((args.b, args.n), bool)
    prs = jnp.asarray(
        rng.integers(0, args.b, (args.pairs, 2)).astype(np.int32))
    tm, tn = match_mod._auto_tiles(args.n, args.n)

    res = {}
    res["full_s"] = _time(lambda: match_mod.l2_top2_block_pallas(
        desc, mask, prs, tm, tn, True)[0])
    for mode in ("mm_only", "min_only"):
        res[f"{mode}_s"] = _time(lambda m=mode: _ablated_block(
            desc, mask, prs, tm, tn, m))

    P = args.pairs
    flop_pair = 2 * args.n * args.n * args.d
    out = {
        "n": args.n, "d": args.d, "pairs": P,
        "tile_m": tm, "tile_n": tn,
        "flop_per_pair_g": round(flop_pair / 1e9, 3),
        "backend": jax.default_backend(),
    }
    for k, v in res.items():
        tag = k[:-2]
        out[f"{tag}_pairs_per_s"] = round(P / v, 1)
        out[f"{tag}_tflops"] = round(flop_pair * P / v / 1e12, 2)
    out["top2_overhead_s_per_pair_us"] = round(
        (res["full_s"] - res["mm_only_s"]) / P * 1e6, 2)
    out["min_pass_s_per_pair_us"] = round(
        (res["min_only_s"] - res["mm_only_s"]) / P * 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
