"""1000-view full-reconstruction stress bench (VERDICT r3 item 2).

Runs the COMPLETE pipeline — feature detection -> window-pruned pair
matching -> ACRANSAC filtering -> incremental SfM -> bundle adjustment —
on a ~1000-view synthetic city sequence (regard3d_tpu/ingest/synth.py
``make_city``: exact GT poses, O(1) render cost per view) and gates:

* >= 95% of cameras posed;
* ATE (Sim3-aligned) <= 0.5% of the trajectory extent;
* wall time per stage + end-to-end and peak RSS recorded.

This is the BASELINE.md scale axis (Rome16K stand-in — the sandbox has no
network, so view count is the scaled dimension; the reference streams
arbitrary project sizes through its per-pair OpenMP loop,
src/R3DComputeMatches.cpp:877-899, and its engine loop,
src/threads/R3DTriangulationThread.cpp).

Writes SCALE1000.json (merged into bench.py's extra when present).

Run: python bench_scale.py [--views 1000] [--window 8] [--hw 256]
"""

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "SCALE1000.json")


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=1000)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--max-keypoints", type=int, default=1024)
    ap.add_argument("--engine", default="incremental2")
    ap.add_argument("--ba-every", type=int, default=25,
                    help="incremental local-BA cadence (views between BAs)")
    ap.add_argument("--ba-iterations", type=int, default=12)
    ap.add_argument("--final-ba-iterations", type=int, default=100,
                    help="post-growth full-BA polish; loop-closure drift "
                         "redistribution happens here")
    ap.add_argument("--loop", action="store_true", default=True,
                    help="closed-circuit capture (loop closure; default)")
    ap.add_argument("--no-loop", dest="loop", action="store_false",
                    help="open corridor (pure odometry: scale drift is "
                         "unobservable and ATE grows superlinearly)")
    ap.add_argument("--retrieval-k", type=int, default=8,
                    help="retrieval loop-closure pairs per image on top of "
                         "the window (0 disables)")
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--workdir", default=None,
                    help="persistent work dir: render + matching artifacts "
                         "are cached and reused on rerun (default: fresh "
                         "temp dir, as the gate artifact requires)")
    args = ap.parse_args()

    from regard3d_tpu import runtime
    runtime.setup()
    import jax
    from regard3d_tpu.core import metrics
    from regard3d_tpu.core.sfm_data import load_npz
    from regard3d_tpu.core.types import PINHOLE
    from regard3d_tpu.ingest import synth
    from regard3d_tpu.pipeline import compute_matches as cm
    from regard3d_tpu.pipeline import triangulation_step as ts

    t0 = time.time()
    render_npz = (os.path.join(args.workdir, "render.npz")
                  if args.workdir else None)
    if render_npz and os.path.exists(render_npz):
        z = np.load(render_npz)
        ds = {k: z[k] for k in z.files}
        ds["images"] = list(ds["images"])
        ds["f"] = float(ds["f"])
        ds["hw"] = int(ds["hw"])
    else:
        ds = synth.make_city(n_cams=args.views, hw=args.hw, loop=args.loop)
        if render_npz:
            os.makedirs(args.workdir, exist_ok=True)
            np.savez(render_npz, images=np.stack(ds["images"]),
                     Cs=ds["Cs"], f=ds["f"], hw=ds["hw"])
    t_render = time.time() - t0
    V = len(ds["images"])
    pairs = synth.window_pairs(V, args.window)
    print(f"# rendered {V} views in {t_render:.0f}s "
          f"({'loop' if args.loop else 'corridor'}), "
          f"{len(pairs)} window pairs", flush=True)

    f_prior = 1.03 * ds["f"]
    stage_t = {}
    stage_rss = {"render_rss_gb": round(peak_rss_gb(), 2)}
    tmp_ctx = (tempfile.TemporaryDirectory() if args.workdir is None
               else None)
    tmp = tmp_ctx.name if tmp_ctx else args.workdir
    try:
        out = os.path.join(tmp, "matches")
        t1 = time.time()
        done_marker = os.path.join(out, ".matches_done")
        if args.workdir and os.path.exists(done_marker):
            mstats = json.load(open(done_marker))
        else:
            mstats = cm.run_compute_matches(
                ds["images"], out, threshold=0.0005,
                cfg=cm.MatchConfig(ransac_iters=1024),
                focals=np.full(V, f_prior),
                max_keypoints=args.max_keypoints, pairs=pairs,
                retrieval_k=args.retrieval_k,
                progress=None, release_memory=True)
            if args.workdir:
                with open(done_marker, "w") as fh:
                    json.dump({k: v for k, v in mstats.items()
                               if isinstance(v, (int, float, str))}, fh)
        stage_t["matches_s"] = round(time.time() - t1, 1)
        stage_rss["matches_rss_gb"] = round(peak_rss_gb(), 2)
        print(f"# matching done in {stage_t['matches_s']}s: "
              f"{mstats['pairs_f']} F-pairs "
              f"(+{mstats.get('pairs_retrieval', 0)} retrieval)",
              flush=True)
        # matching executables are dead weight for the SfM stage
        runtime.release_stage_memory()

        intr = np.zeros((1, 9), np.float32)
        intr[0, :3] = [f_prior, ds["hw"] / 2, ds["hw"] / 2]
        tri = os.path.join(tmp, "tri")
        t2 = time.time()
        tstats = ts.run_triangulation(
            out, tri, ds["images"],
            intr_id=np.zeros(V, np.int32), intr=intr,
            models=np.asarray([PINHOLE], np.int32),
            params=ts.TriangulationParams(
                engine=args.engine, refine_intrinsics=True,
                ba_every=args.ba_every, ba_iterations=args.ba_iterations,
                final_ba_iterations=args.final_ba_iterations))
        stage_t["sfm_s"] = round(time.time() - t2, 1)
        stage_rss["sfm_rss_gb"] = round(peak_rss_gb(), 2)
        scene = load_npz(os.path.join(tri, "scene.npz"))
    finally:
        if tmp_ctx:
            tmp_ctx.cleanup()

    pm = np.asarray(scene.poses.mask)
    C_est = np.asarray(scene.poses.C)[pm]
    ate = float(metrics.ate_rmse(C_est, ds["Cs"][np.nonzero(pm)[0]]))
    extent = float(np.linalg.norm(ds["Cs"].max(0) - ds["Cs"].min(0)))

    posed_frac = float(pm.sum()) / V
    gates = {
        "posed_ok": posed_frac >= 0.95,
        "ate_ok": ate <= 0.005 * extent,
    }
    result = {
        "views": V,
        "window": args.window,
        "loop": args.loop,
        "retrieval_k": args.retrieval_k,
        "pairs": len(pairs) + int(mstats.get("pairs_retrieval", 0)),
        "pairs_retrieval": int(mstats.get("pairs_retrieval", 0)),
        "engine": args.engine,
        "num_cameras": int(pm.sum()),
        "posed_fraction": round(posed_frac, 4),
        "num_tracks": int(tstats["num_tracks"]),
        "num_observations": int(tstats.get("num_observations", 0)),
        "ate": round(ate, 4),
        "trajectory_extent": round(extent, 1),
        "ate_fraction_of_extent": round(ate / extent, 6),
        "rms_px": round(float(tstats["rms_px"]), 3),
        "render_s": round(t_render, 1),
        **stage_t,
        "total_s": round(time.time() - t0, 1),
        "peak_rss_gb": round(peak_rss_gb(), 2),
        **stage_rss,
        "sfm_profile": tstats.get("profile"),
        "backend": jax.default_backend(),
        "gates": gates,
        "ok": all(gates.values()),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
