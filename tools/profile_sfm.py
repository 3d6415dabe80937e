"""Quick SfM-engine-only profiler: corridor scene, no detection/matching.

Measures run_incremental wall time + stage-internal breakdown so engine
optimizations can be iterated without paying the full pipeline. CPU by
default; run on TPU by clearing JAX_PLATFORMS.

Usage: python tools/profile_sfm.py [--views 200] [--ba-every 25]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=200)
    ap.add_argument("--pts", type=int, default=4500)
    ap.add_argument("--window", type=float, default=3.0)
    ap.add_argument("--ba-every", type=int, default=25)
    ap.add_argument("--ba-iterations", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    from regard3d_tpu import runtime
    runtime.setup()
    import numpy as np
    import jax
    if args.cpu:
        # the axon TPU plugin overrides JAX_PLATFORMS; force CPU explicitly
        jax.config.update("jax_platforms", "cpu")
    from regard3d_tpu.sfm import incremental
    from regard3d_tpu.core import metrics
    from test_incremental import corridor_scene

    rng = np.random.default_rng(0)
    t0 = time.time()
    inputs, table, Cs = corridor_scene(rng, n_cams=args.views,
                                       n_pts=args.pts, window=args.window)
    print(f"scene built in {time.time()-t0:.1f}s: "
          f"{inputs.xy.shape[0]} obs, {inputs.num_tracks} tracks",
          flush=True)
    cfg = incremental.IncrementalConfig(
        ba_every=args.ba_every, ba_iterations=args.ba_iterations)
    t0 = time.time()
    res = incremental.run_incremental(inputs, cfg=cfg)
    elapsed = time.time() - t0
    pm = res.pose_mask
    ate = metrics.ate_rmse(np.asarray(res.C)[pm], Cs[pm])
    print(f"backend={jax.default_backend()} views={args.views} "
          f"posed={int(pm.sum())} rms={res.stats['rms_px']:.3f} "
          f"ate={ate:.4f}")
    print(f"TOTAL {elapsed:.1f}s  profile={res.stats['profile']}")


if __name__ == "__main__":
    main()
