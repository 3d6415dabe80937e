"""Headline benchmark: BOTH BASELINE.json metrics in one JSON line.

* ``matched pairs/s/chip`` — one "pair" is a full putative-matching problem:
  4096 x 4096 LIOP descriptors (padded 256-D), fused L2 distance + top-2 +
  ratio test on the MXU (the driver-parsed headline value).
* ``BA iters/s at 1/N hosts`` — the damped LM trial step (linearize ->
  implicit-Schur CG -> update) timed single-device on the live backend and
  on an 8-virtual-device ``shard_map``+psum mesh (subprocess, CPU backend),
  reported in ``extra``.

``vs_baseline`` divides by a *measured* CPU brute-force matcher on this
host (NumPy/BLAS sgemm + top-2 over the same problem) instead of an assumed
constant — the reference app's FLANN/KGraph ANN path is the same O(M*N*D)
work with approximations on top.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


from bench_util import sync as _sync


def measure_cpu_reference(M=4096, N=4096, D=256, reps=3):
    """Measured host-CPU brute-force matcher throughput (pairs/s): BLAS
    sgemm distance matrix + per-row top-2 + ratio test in NumPy."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(M, D)).astype(np.float32)
    b = rng.normal(size=(N, D)).astype(np.float32)
    bb = (b * b).sum(1)

    def one():
        d = -2.0 * (a @ b.T)
        d += bb[None, :]
        idx2 = np.argpartition(d, 1, axis=1)[:, :2]
        v = np.take_along_axis(d, idx2, axis=1)
        d1 = v.min(1)
        d2 = v.max(1)
        return (d1 < 0.64 * d2).sum()

    one()                                   # warm BLAS threads
    t0 = time.time()
    for _ in range(reps):
        one()
    return reps / (time.time() - t0)


def measure_tpu_matching(N=4096, D=256, B=10, P=64, bf16=False):
    """Production matching path: ``match_pair_block`` dispatches a block of
    P pairs at once through the scalar-prefetch batched kernel (pair tiles
    DMA straight from the shared descriptor array — the pipeline's P2 pair
    blocks).  ``bf16=True`` times the fast/medium presets (bfloat16 MXU
    inputs, f32 accumulation — the same approximate-for-speed trade as the
    reference's DEFAULT approximate ANN matchers); ``bf16=False`` is the
    brute-force/precise preset at full f32 precision.
    Returns matched pairs/s."""
    import jax
    import jax.numpy as jnp
    from regard3d_tpu.kernels import match

    rng = np.random.default_rng(0)
    # distinct input variants so no dispatch/caching layer can elide work
    descs = [jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
             for _ in range(2)]
    mask = jnp.ones((B, N), bool)
    pairs = jnp.asarray(rng.integers(0, B, size=(P, 2)), jnp.int32)

    on_tpu = jax.default_backend() == "tpu"

    def run(k):
        return match.match_pair_block(descs[k % 2], mask, pairs, 0.8,
                                      use_pallas=on_tpu, bf16=bf16)

    _sync(run(0))
    _sync(run(1))
    iters = 20 if on_tpu else 2
    t0 = time.time()
    for k in range(iters):
        out = run(k)
    _sync(out)
    return iters * P / (time.time() - t0)


def run_ba_bench(extra_args, timeout=1200):
    """bench_ba.py in a subprocess (its backend/mesh config must be chosen
    before JAX initializes). Returns the parsed JSON dict or None."""
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_ba.py")] + extra_args
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def run_features_bench(timeout=1500):
    """bench_features.py in a subprocess (features + RANSAC throughput on
    the live backend). Returns the parsed JSON dict or None."""
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_features.py"), "--reps", "6"]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def main():
    from regard3d_tpu import runtime
    runtime.setup(precision=None)   # persistent compile cache
    # headline = the bf16 fast/medium preset: the apples-to-apples
    # counterpart of the reference's DEFAULT approximate ANN matchers
    # (FLANN/KGraph, src/R3DComputeMatches.cpp:2035-2062); the f32 number
    # is the brute-force/precise preset at full precision
    pairs_per_s_f32 = measure_tpu_matching(bf16=False)
    pairs_per_s = measure_tpu_matching(bf16=True)
    cpu_ref = measure_cpu_reference()

    # BA scaling curve (point-block-sharded distributed BA, ba/sharded.py):
    # strong scaling shares the CPU backend and the SAME problem; the
    # weak-scaling pair holds per-device landmarks AND observations fixed
    # (12.5k pts / 150k obs per device).  The TPU 1-dev point is the
    # absolute per-chip number.  NOTE this host has 2 physical cores, so an
    # 8-virtual-device CPU mesh is 4x oversubscribed: the raw weak number
    # is bounded above by cores/N = 0.25 even with zero communication; the
    # core-scaled figure (raw * N / min(N, cores)) removes that bound and
    # is the ICI-relevant efficiency.
    NCORES = os.cpu_count() or 1
    PROB = ["--cams", "300", "--pts", "50000", "--obs-per-pt", "12"]
    WEAK1 = ["--cams", "300", "--pts", "12500", "--obs-per-pt", "12"]
    WEAK8 = ["--cams", "300", "--pts", "100000", "--obs-per-pt", "12"]
    BIG = ["--cams", "1000", "--pts", "1000000", "--obs-per-pt", "4",
           "--iters", "3"]
    ba_tpu1 = run_ba_bench(PROB)
    ba_cpu1 = run_ba_bench(PROB + ["--cpu"])
    ba_pt8 = run_ba_bench(PROB + ["--mesh", "8", "--point-sharded"])
    ba_obs8 = run_ba_bench(PROB + ["--mesh", "8"])
    ba_w1 = run_ba_bench(WEAK1 + ["--cpu"])
    ba_w8 = run_ba_bench(WEAK8 + ["--mesh", "8", "--point-sharded"])
    ba_1m = run_ba_bench(BIG + ["--mesh", "8", "--point-sharded"],
                         timeout=2400)
    # compiled C++ Schur-LM on the identical 300/50k problem — the Ceres
    # stand-in of BASELINE.md's "BA iters/s" row (native/lm_baseline.cpp)
    ba_cpp = run_ba_bench(PROB + ["--cpp", "--iters", "5"], timeout=1800)
    fb = run_features_bench()

    def val(d):
        return d and d.get("value")

    # committed 1000-view full-reconstruction stress result (bench_scale.py
    # — too long for the per-round bench budget, run + committed in-round).
    # No fallback: if the 1000-view artifact is absent, say so.
    scale = None
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SCALE1000.json")
    if os.path.exists(p):
        try:
            with open(p) as fh:
                scale = json.load(fh)
        except Exception:
            pass

    # committed global-engine accuracy rows (bench_accuracy --engine global)
    glob = None
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "GLOBAL.json")
    if os.path.exists(p):
        try:
            with open(p) as fh:
                glob = json.load(fh)
        except Exception:
            pass

    # committed distributed-BA communication/memory dossier
    # (bench_ba_dossier.py — compile-level evidence on the virtual mesh)
    dossier = None
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BA_DOSSIER.json")
    if os.path.exists(p):
        try:
            with open(p) as fh:
                dossier = json.load(fh)
        except Exception:
            pass

    strong = (val(ba_pt8) / val(ba_cpu1)
              if val(ba_pt8) and val(ba_cpu1) else None)
    strong_obs = (val(ba_obs8) / val(ba_cpu1)
                  if val(ba_obs8) and val(ba_cpu1) else None)
    weak = (val(ba_w8) / val(ba_w1)
            if val(ba_w8) and val(ba_w1) else None)
    weak_cs = weak and min(weak * 8.0 / min(8, NCORES), 1.0)

    print(json.dumps({
        "metric": "matched_pairs_per_s_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": ("pairs/s (4096x4096x256 fused match, bf16 fast preset — "
                 "reference-default-equivalent; f32 precise in extra)"),
        "vs_baseline": round(pairs_per_s / cpu_ref, 2),
        "extra": {
            "cpu_reference_pairs_per_s_measured": round(cpu_ref, 2),
            "matching_bf16_pairs_per_s": round(pairs_per_s, 2),
            "matching_f32_precise_pairs_per_s": round(pairs_per_s_f32, 2),
            "ba_lm_iters_per_s_1dev": val(ba_tpu1),
            "ba_1dev_detail": ba_tpu1 and ba_tpu1.get("unit"),
            "ba_1dev_backend": ba_tpu1 and ba_tpu1.get("backend"),
            "ba_lm_iters_per_s_cpu1": val(ba_cpu1),
            "ba_point_sharded_iters_per_s_cpu_mesh8": val(ba_pt8),
            "ba_obs_sharded_iters_per_s_cpu_mesh8": val(ba_obs8),
            "ba_strong_scaling_x_mesh8_vs_1dev_cpu":
                strong and round(strong, 2),
            "ba_strong_scaling_x_mesh8_obs_sharded":
                strong_obs and round(strong_obs, 2),
            # headline weak-scaling key = the RAW measurement; the
            # core-count correction is an estimate and labeled as such
            "ba_weak_scaling_efficiency":
                weak and round(weak, 2),
            "ba_weak_scaling_efficiency_core_scaled_estimate":
                weak_cs and round(weak_cs, 2),
            "ba_weak_detail": (
                "point-block sharding; per-device fixed at 12.5k landmarks "
                "/ 150k obs (1 dev vs mesh-8), CPU backend; host has "
                f"{NCORES} cores so mesh-8 is {8 // max(NCORES, 1)}x "
                "oversubscribed — the raw (headline) efficiency is bounded "
                f"above by {min(8, NCORES)}/8 = {min(8, NCORES)/8:.2f} even "
                "with zero communication; the core-scaled key removes that "
                "bound (raw * 8/min(8,cores), capped at 1) and is an "
                "ESTIMATE, not a measurement"),
            "ba_lm_iters_per_s_cpp_baseline": val(ba_cpp),
            "ba_cpp_detail": ba_cpp and ba_cpp.get("unit"),
            "ba_point_sharded_1m_landmarks_iters_per_s": val(ba_1m),
            "ba_1m_detail": ba_1m and ba_1m.get("unit"),
            "ba_1m_landmark_state_bytes_per_device":
                ba_1m and ba_1m.get("landmark_state_bytes_per_device"),
            "features_imgs_per_s": fb and fb.get("features_imgs_per_s"),
            "ransac_pairs_per_s": fb and fb.get("ransac_pairs_per_s"),
            "features_backend": fb and fb.get("backend"),
            "cpu_features_imgs_per_s":
                fb and fb.get("cpu_features_imgs_per_s"),
            "cpu_ransac_pairs_per_s":
                fb and fb.get("cpu_ransac_pairs_per_s"),
            "features_vs_cpu": fb and fb.get("features_vs_cpu"),
            "ransac_vs_cpu": fb and fb.get("ransac_vs_cpu"),
            "global_sfm_accuracy": glob and {
                "ok": glob.get("ok"),
                "rows": [{k: r.get(k) for k in
                          ("dataset", "num_cameras", "ate", "rms_px")}
                         for r in glob.get("results", [])]},
            "ba_dossier": dossier and {
                "per_cg_step_collective_bytes": {
                    name: {str(r["L"]): r[name]["hlo_per_cg_step_bytes"]
                           for r in dossier["rows"]}
                    for name in ("obs_sharded", "point_sharded")},
                "verified": [r["verified"] for r in dossier["rows"]],
                "hbm_projection": dossier.get("hbm_projection"),
                "executed_8m_point_sharded":
                    dossier.get("executed_8m_point_sharded"),
            },
            "scale_stress": scale and {
                k: scale.get(k) for k in
                ("views", "window", "pairs", "engine", "num_cameras",
                 "posed_fraction", "num_tracks", "ate",
                 "ate_fraction_of_extent", "rms_px", "render_s",
                 "matches_s", "sfm_s", "total_s", "peak_rss_gb",
                 "backend", "ok")},
        },
    }))


if __name__ == "__main__":
    main()
