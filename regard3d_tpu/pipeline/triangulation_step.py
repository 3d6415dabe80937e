"""Triangulation (SfM) stage driver.

Rebuilds ``R3DTriangulationThread`` (src/threads/R3DTriangulationThread.cpp):
load features + filtered matches -> tracks -> SfM engine (incremental v1
with user initial pair / incremental v2 auto-init / global with averaging
menus) -> outputs: scene.npz (sfm_data.bin role), sfm_data.json,
cloud_and_poses.ply, FinalColorized.ply, Reconstruction_Report.html,
residual statistics (:634-679 parity).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core import metrics, sfm_data
from regard3d_tpu.core.types import Scene, RADIAL_K3
from regard3d_tpu.export import ply as ply_mod
from regard3d_tpu.pipeline import compute_matches as cm
from regard3d_tpu.pipeline import features as feat_mod
from regard3d_tpu.pipeline.report import write_html_report
from regard3d_tpu.sfm import global_sfm, incremental, tracks as tracks_mod


@dataclasses.dataclass(frozen=True)
class TriangulationParams:
    """Engine menu parity (src/R3DProject.h:258-266)."""
    engine: str = "incremental2"      # incremental | incremental2 | global
    initial_pair: Optional[Tuple[int, int]] = None     # incremental v1
    initializer: str = "maxpair"      # incremental2: maxpair | stellar
    rotation_averaging: str = "l2"                     # global: l1 | l2
    translation_averaging: str = "softl1"  # l1 | l2_chordal | softl1
    refine_intrinsics: bool = True
    use_gps: bool = False
    matches_kind: str = "f"           # global engine requires "e" (:222)
    min_pair_matches: int = 30        # global: pair-support gate
    f64: bool = False                 # run the engines in float64 (the
                                      # reference's Ceres BA runs double —
                                      # SURVEY §7 hard part 5); requires
                                      # jax_enable_x64
    dist_ba: bool = False             # final BA polish sharded over ALL
                                      # devices (ba/sharded.py) — the
                                      # multi-process path `r3d launch`
                                      # drives; every process participates
                                      # in the psum collectives
    dist_ba_iterations: int = 30
    ba_every: int = 3                 # incremental: local BA cadence —
                                      # raise for 1000-view-class scenes
    ba_iterations: int = 20
    final_ba_iterations: int = 40     # the post-growth polish; loop-closed
                                      # captures redistribute drift here


def build_sfm_inputs(matches_dir: str, num_images: int,
                     intr_id: np.ndarray, intr: np.ndarray,
                     models: np.ndarray, image_sizes: np.ndarray,
                     matches_kind: str = "f", dtype=np.float32):
    """Features + match files -> tracks -> static SfMInputs."""
    matches = cm.load_matches_txt(
        os.path.join(matches_dir, f"matches.{matches_kind}.txt"))
    table = tracks_mod.build_tracks(matches)
    xy = np.zeros((len(table.track_id), 2), dtype)
    vid = np.asarray(table.view_id)
    fid = np.asarray(table.feature_id)
    order = np.argsort(vid, kind="stable")
    starts = np.searchsorted(vid[order], np.arange(num_images + 1))
    for v in range(num_images):
        rows = order[starts[v]:starts[v + 1]]
        if len(rows):
            xy[rows] = feat_mod.load_features(matches_dir, v)[0][fid[rows]]
    return incremental.SfMInputs(
        xy=jnp.asarray(xy, dtype),
        track_id=jnp.asarray(table.track_id),
        view_id=jnp.asarray(table.view_id),
        feature_id=jnp.asarray(table.feature_id),
        num_tracks=table.num_tracks,
        intr_id=jnp.asarray(intr_id),
        intr=jnp.asarray(intr, dtype),
        models=jnp.asarray(models),
        image_sizes=image_sizes,
    ), table


def result_to_scene(result: incremental.SfMResult,
                    inputs: incremental.SfMInputs,
                    image_sizes: np.ndarray,
                    colors: Optional[np.ndarray] = None) -> Scene:
    """Pack an engine result into the persistent Scene container."""
    V = len(image_sizes)
    T = inputs.num_tracks
    O = inputs.xy.shape[0]
    s = Scene.empty(V, int(np.asarray(inputs.intr).shape[0]), T, O)
    tid = np.asarray(inputs.track_id)
    vid = np.asarray(inputs.view_id)
    live = (result.obs_active & result.track_ok[tid] & result.pose_mask[vid])
    s = s.replace(
        views=s.views.replace(
            width=jnp.asarray(image_sizes[:, 0].astype(np.int32)),
            height=jnp.asarray(image_sizes[:, 1].astype(np.int32)),
            intrinsic_id=jnp.asarray(inputs.intr_id),
            mask=jnp.ones((V,), bool)),
        intrinsics=s.intrinsics.replace(
            model=jnp.asarray(inputs.models),
            params=jnp.asarray(result.intr),
            mask=jnp.ones((np.asarray(inputs.intr).shape[0],), bool)),
        poses=s.poses.replace(
            R=result.R, C=result.C, mask=jnp.asarray(result.pose_mask)),
        landmarks=s.landmarks.replace(
            X=result.X,
            color=(jnp.asarray(colors) if colors is not None
                   else jnp.full((T, 3), 0.8)),
            mask=jnp.asarray(result.track_ok)),
        observations=s.observations.replace(
            landmark_id=jnp.asarray(tid),
            view_id=jnp.asarray(vid),
            xy=inputs.xy,
            feature_id=jnp.asarray(inputs.feature_id),
            mask=jnp.asarray(live)),
    )
    return s


def colorize_tracks(inputs, result, images: Sequence[np.ndarray]
                    ) -> np.ndarray:
    """Track colors from the first observing image (ColorizeTracks parity,
    src/utils/OpenMVGHelper.cpp:2453). images: gray or RGB float arrays."""
    T = inputs.num_tracks
    colors = np.full((T, 3), 0.8, np.float32)
    tid = np.asarray(inputs.track_id)
    vid = np.asarray(inputs.view_id)
    xy = np.asarray(inputs.xy)
    # first observation of each live track (vectorized: stable sort by
    # track id, unique picks the first row per track)
    order = np.argsort(tid, kind="stable")
    uniq, first = np.unique(tid[order], return_index=True)
    rows = order[first]
    live = np.asarray(result.track_ok)[uniq]
    uniq, rows = uniq[live], rows[live]
    # group those first-obs rows by view so each image is touched once
    vorder = np.argsort(vid[rows], kind="stable")
    uniq, rows = uniq[vorder], rows[vorder]
    bounds = np.searchsorted(vid[rows], np.arange(len(images) + 1))
    for v in range(len(images)):
        sel = slice(bounds[v], bounds[v + 1])
        if sel.start == sel.stop:
            continue
        img = np.asarray(images[v])
        x = np.clip(np.rint(xy[rows[sel], 0]), 0,
                    img.shape[1] - 1).astype(np.int64)
        y = np.clip(np.rint(xy[rows[sel], 1]), 0,
                    img.shape[0] - 1).astype(np.int64)
        c = img[y, x]
        colors[uniq[sel]] = c[:, None] if c.ndim == 1 else c[:, :3]
    return colors


def run_triangulation(matches_dir: str, out_dir: str,
                      images: Sequence[np.ndarray],
                      intr_id: np.ndarray, intr: np.ndarray,
                      models: np.ndarray,
                      params: TriangulationParams = TriangulationParams(),
                      image_names: Optional[List[str]] = None,
                      center_priors: Optional[np.ndarray] = None,
                      seed: int = 0, write_artifacts: bool = True) -> Dict:
    """Full triangulation step; writes artifacts; returns stats.

    ``write_artifacts=False`` computes everything but touches no files —
    secondary processes of a multi-process job use it so only the primary
    writes (dist/launch.py ``is_primary`` contract)."""
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    image_sizes = np.asarray([[im.shape[1], im.shape[0]] for im in images])

    kind = "e" if params.engine == "global" else params.matches_kind
    dtype = np.float64 if params.f64 else np.float32
    if params.f64:
        import jax
        if not jax.config.read("jax_enable_x64"):
            raise ValueError("f64 engines need jax_enable_x64 "
                             "(r3d sfm --f64 sets it before compute)")
    inputs, table = build_sfm_inputs(matches_dir, len(images), intr_id, intr,
                                     models, image_sizes, kind, dtype=dtype)

    if params.engine == "global":
        result = global_sfm.run_global(
            inputs, global_sfm.GlobalConfig(
                rotation_loss=params.rotation_averaging,
                translation_loss=params.translation_averaging,
                refine_intrinsics=params.refine_intrinsics,
                min_pair_inliers=params.min_pair_matches), seed=seed)
    else:
        init = params.initial_pair if params.engine == "incremental" else None
        result = incremental.run_incremental(
            inputs, initial_pair=init,
            cfg=incremental.IncrementalConfig(
                refine_intrinsics=params.refine_intrinsics,
                initializer=params.initializer,
                ba_every=params.ba_every,
                ba_iterations=params.ba_iterations,
                final_ba_iterations=params.final_ba_iterations), seed=seed,
            center_priors=(center_priors if params.use_gps else None))

    if params.dist_ba:
        result = _dist_ba_polish(result, inputs, params)

    colors = colorize_tracks(inputs, result, images)
    scene = result_to_scene(result, inputs, image_sizes, colors)

    # artifacts (contract parity, SURVEY.md §A.4)
    if write_artifacts:
        sfm_data.save_npz(os.path.join(out_dir, "scene.npz"), scene)
        sfm_data.save_json(os.path.join(out_dir, "sfm_data.json"), scene,
                           image_names)
        ok = np.asarray(result.track_ok)
        ply_mod.export_cloud_and_poses(
            os.path.join(out_dir, "cloud_and_poses.ply"),
            np.asarray(result.X)[ok],
            np.clip(colors[ok] * 255, 0, 255).astype(np.uint8),
            np.asarray(result.C)[result.pose_mask])
        ply_mod.write_ply(os.path.join(out_dir, "FinalColorized.ply"),
                          ply_mod.PlyData(
                              xyz=np.asarray(result.X)[ok],
                              rgb=np.clip(colors[ok] * 255, 0,
                                          255).astype(np.uint8)))
    stats = dict(result.stats)
    stats["elapsed_s"] = time.time() - t0

    # per-view residual tables + histogram (Generate_SfM_Report parity)
    from regard3d_tpu.sfm.triangulate import reprojection_residuals_px
    tid = np.asarray(inputs.track_id)
    vid = np.asarray(inputs.view_id)
    iid = np.asarray(inputs.intr_id)
    r2 = np.asarray(reprojection_residuals_px(
        result.R, result.C, result.intr, inputs.models,
        jnp.asarray(iid[vid]), jnp.asarray(vid), jnp.asarray(tid),
        result.X, inputs.xy))
    live = (result.obs_active & result.track_ok[tid] & result.pose_mask[vid])
    r = np.sqrt(r2[live])
    vlive = vid[live]
    V = len(images)
    n_obs = np.bincount(vlive, minlength=V)
    sums = np.bincount(vlive, weights=r, minlength=V)
    _vorder = np.argsort(vlive, kind="stable")
    _vbounds = np.searchsorted(vlive[_vorder], np.arange(V + 1))
    views_rows = []
    for v in range(V):
        rv = r[_vorder[_vbounds[v]:_vbounds[v + 1]]]
        views_rows.append({
            "id": v,
            "name": image_names[v] if image_names else "",
            "width": int(image_sizes[v, 0]),
            "height": int(image_sizes[v, 1]),
            "posed": bool(result.pose_mask[v]),
            "n_obs": int(n_obs[v]),
            "mean_px": float(sums[v] / n_obs[v]) if n_obs[v] else float("nan"),
            "median_px": float(np.median(rv)) if len(rv) else float("nan"),
        })
    if params.dist_ba and len(r):
        # the sharded polish changed the state after the engine computed
        # its stats — refresh the residual summary from the final state
        stats.update({
            "rms_px": float(np.sqrt((r ** 2).mean())),
            "residual_min": float(r.min()),
            "residual_max": float(r.max()),
            "residual_mean": float(r.mean()),
            "residual_median": float(np.median(r)),
        })
    if len(r):
        counts, edges = np.histogram(r, bins=20,
                                     range=(0.0, max(4.0, float(r.max()))))
        hist = (edges, counts)
    else:
        hist = None
    if write_artifacts:
        from regard3d_tpu.pipeline.report import scene_snapshots_svg
        snaps = scene_snapshots_svg(
            result.C, result.R, result.pose_mask,
            result.X, np.asarray(result.track_ok), colors=colors)
        write_html_report(os.path.join(out_dir,
                                       "Reconstruction_Report.html"),
                          stats, params, views=views_rows, histogram=hist,
                          snapshots=snaps)
    return stats


def _dist_ba_polish(result: incremental.SfMResult,
                    inputs: incremental.SfMInputs,
                    params: TriangulationParams) -> incremental.SfMResult:
    """Final BA refinement sharded over every visible device.

    The production caller of ``ba.sharded.bundle_adjust_sharded`` (P6 of
    SURVEY.md §2.3 — the reference's Ceres multithreaded BA,
    src/CMakeLists.txt:315): the observation table splits over an ``obs``
    mesh axis spanning all devices of all processes; psum forms the global
    normal equations.  Every process of a multi-process job must call this
    collectively (``r3d sfm --dist-ba`` under ``r3d launch``)."""
    import jax
    from regard3d_tpu.ba import lm as lm_mod, sharded
    from regard3d_tpu.dist import mesh as meshlib
    devs = jax.devices()
    mesh = meshlib.make_mesh("obs", devices=devs)
    tid = np.asarray(inputs.track_id)
    vid = np.asarray(inputs.view_id)
    iid = np.asarray(inputs.intr_id)
    w = (result.obs_active & result.track_ok[tid]
         & result.pose_mask[vid])
    obs = lm_mod.BAObservations(
        view_id=inputs.view_id, intr_id=inputs.intr_id[inputs.view_id],
        point_id=inputs.track_id,
        model=inputs.models[inputs.intr_id[inputs.view_id]],
        xy=inputs.xy, weight=jnp.asarray(w, inputs.xy.dtype))
    # gauge: unposed cameras stay fixed, plus the first posed camera
    fixed = ~result.pose_mask.copy()
    posed = np.nonzero(result.pose_mask)[0]
    if len(posed):
        fixed[posed[0]] = True
    state = lm_mod.BAState(R=result.R, C=result.C, intr=result.intr,
                           X=result.X)
    opts = lm_mod.BAOptions(max_iterations=params.dist_ba_iterations,
                            refine_intrinsics=params.refine_intrinsics)
    if jax.process_count() == 1:
        # production path: landmark blocks sharded, O(L/N) per device,
        # camera-system-only collectives
        out, _ = sharded.bundle_adjust_point_sharded(
            state, obs, mesh, opts, fixed_pose_mask=jnp.asarray(fixed))
    else:
        # multi-process: the partition tables would need a multihost
        # device_put; the observation-sharded path feeds global arrays
        # straight through pjit, which is multihost-safe today
        out, _ = sharded.bundle_adjust_sharded(
            state, obs, mesh, opts, fixed_pose_mask=jnp.asarray(fixed))
    return result._replace(R=out.R, C=out.C, intr=out.intr, X=out.X)
