"""Host orchestration for the TPU-native densifier.

Replaces the reference's external CMVS -> genOption -> pmvs2 chain
(``src/R3DDensificationProcess.cpp:105-183``) with an in-process pipeline:

  scene.npz + images -> undistort -> pyramid level -> per-view source
  selection (shared-landmark scores, CMVS's view-graph role) -> plane-sweep
  depth maps (one static-shape jitted program, views looped on host) ->
  cross-view consistency fusion -> dense colored+normal PLY.

Source selection mirrors what CMVS extracts from the SfM result: views are
ranked per reference view by shared-track count, weighted by triangulation
angle so near-identical baselines don't win (CMVS clusters on the same
co-visibility signal, ``src/R3DDensificationProcess.cpp:113-130``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Scene
from regard3d_tpu.mvs import fusion, planesweep
from regard3d_tpu.mvs.planesweep import PlaneSweepParams


@dataclasses.dataclass
class DepthMapResult:
    view_id: int
    idepth: np.ndarray      # (H, W) inverse depth at the sweep level
    ncc: np.ndarray         # (H, W) photometric confidence
    valid: np.ndarray       # (H, W) bool (ncc >= threshold)
    K: np.ndarray           # (3, 3) level-scaled intrinsics
    sources: List[int]


def _posed_views(scene: Scene) -> List[int]:
    vm = np.asarray(scene.views.mask)
    pm = np.asarray(scene.poses.mask)
    pid = np.asarray(scene.views.pose_id)
    return [int(v) for v in np.nonzero(vm)[0] if pm[pid[v]]]


def _K_for(scene: Scene, view: int, level: int) -> np.ndarray:
    k = int(np.asarray(scene.views.intrinsic_id)[view])
    p = np.asarray(scene.intrinsics.params)[k]
    s = 1.0 / (2 ** level)
    # pixel-center-consistent scaling: u_l = (u + 0.5) * s - 0.5
    return np.array([[p[0] * s, 0.0, (p[1] + 0.5) * s - 0.5],
                     [0.0, p[0] * s, (p[2] + 0.5) * s - 0.5],
                     [0.0, 0.0, 1.0]])


def select_sources(scene: Scene, num_sources: int,
                   min_angle_deg: float = 2.0) -> Dict[int, List[int]]:
    """Per-view source ranking by shared-landmark count x angle weight."""
    obs_l = np.asarray(scene.observations.landmark_id)
    obs_v = np.asarray(scene.observations.view_id)
    obs_m = np.asarray(scene.observations.mask)
    lm_X = np.asarray(scene.landmarks.X)
    lm_m = np.asarray(scene.landmarks.mask)
    pid = np.asarray(scene.views.pose_id)
    C = np.asarray(scene.poses.C)

    live = obs_m & lm_m[obs_l]
    obs_l, obs_v = obs_l[live], obs_v[live]
    views = _posed_views(scene)
    nv = len(views)
    compact = np.full(len(np.asarray(scene.views.mask)), -1, np.int64)
    compact[views] = np.arange(nv)
    Cv = C[pid[views]]                                 # (nv, 3) centers

    # drop observations of unposed views, sort by landmark
    cidx_all = compact[obs_v]
    keep = cidx_all >= 0
    obs_l, cidx = obs_l[keep], cidx_all[keep]
    order = np.argsort(obs_l, kind="stable")
    obs_l, cidx = obs_l[order], cidx[order]

    # pair co-visibility scores, vectorized: within each landmark segment
    # enumerate view pairs as (row, row+d) offsets — total work
    # sum_l k_l^2 with no per-landmark Python loop (city-scale safe)
    score = np.zeros((nv, nv))
    if len(obs_l):
        max_k = int(np.bincount(obs_l).max())
        for d in range(1, max_k):
            sel = np.nonzero(obs_l[:-d] == obs_l[d:])[0] if d < len(obs_l) \
                else np.zeros(0, np.int64)
            if len(sel) == 0:
                continue
            a, b = cidx[sel], cidx[sel + d]
            X = lm_X[obs_l[sel]]
            r1 = Cv[a] - X
            r2 = Cv[b] - X
            denom = np.maximum(np.linalg.norm(r1, axis=1)
                               * np.linalg.norm(r2, axis=1), 1e-12)
            cosang = np.clip(np.sum(r1 * r2, 1) / denom, -1.0, 1.0)
            ang = np.degrees(np.arccos(cosang))
            w = np.minimum(ang / min_angle_deg, 1.0)   # tiny baselines down
            np.add.at(score, (a, b), w)
            np.add.at(score, (b, a), w)

    out = {}
    for i, v in enumerate(views):
        ranked = np.argsort(-score[i])
        out[v] = [views[j] for j in ranked if score[i, j] > 0][:num_sources]
    return out


def depth_range(scene: Scene, view: int) -> Optional[tuple]:
    """Robust near/far from the sparse landmarks seen by this view
    (PMVS derives its sweep range from the SfM points the same way)."""
    obs_v = np.asarray(scene.observations.view_id)
    obs_l = np.asarray(scene.observations.landmark_id)
    obs_m = np.asarray(scene.observations.mask)
    lm_m = np.asarray(scene.landmarks.mask)
    sel = obs_m & (obs_v == view) & lm_m[obs_l]
    if sel.sum() < 5:
        return None
    X = np.asarray(scene.landmarks.X)[obs_l[sel]]
    p = int(np.asarray(scene.views.pose_id)[view])
    R = np.asarray(scene.poses.R)[p]
    C = np.asarray(scene.poses.C)[p]
    z = (X - C) @ R[2]
    z = z[z > 1e-6]
    if len(z) < 5:
        return None
    lo, hi = np.percentile(z, [2, 98])
    return max(0.25 * lo, 1e-3), 2.0 * hi


def _prep_images(images: Sequence[np.ndarray], scene: Scene,
                 views: List[int], level: int,
                 target_hw: Optional[tuple] = None):
    """Undistort + downsample + pad to one static (H, W); returns
    (gray stack dict, rgb dict, (H, W))."""
    from regard3d_tpu.export.formats import undistort_image

    H = W = 0
    gray, rgb = {}, {}
    for v in views:
        img = np.asarray(images[v])
        und = undistort_image(img, scene, v).astype(np.float32)
        if np.issubdtype(np.asarray(images[v]).dtype, np.integer):
            und = und / 255.0      # float inputs are already in [0, 1]
        for _ in range(level):
            h2, w2 = und.shape[0] // 2 * 2, und.shape[1] // 2 * 2
            und = 0.25 * (und[0:h2:2, 0:w2:2] + und[1:h2:2, 0:w2:2]
                          + und[0:h2:2, 1:w2:2] + und[1:h2:2, 1:w2:2])
        rgb[v] = und
        g = und if und.ndim == 2 else (0.299 * und[..., 0]
                                       + 0.587 * und[..., 1]
                                       + 0.114 * und[..., 2])
        gray[v] = g.astype(np.float32)
        H = max(H, g.shape[0])
        W = max(W, g.shape[1])
    # pad to a lane-friendly multiple (static shape shared by all views)
    H = -(-H // 32) * 32
    W = -(-W // 32) * 32
    if target_hw is not None:
        H, W = max(H, target_hw[0]), max(W, target_hw[1])
    for v in views:
        g = gray[v]
        gray[v] = np.pad(g, ((0, H - g.shape[0]), (0, W - g.shape[1])))
        r = rgb[v]
        pad = ((0, H - r.shape[0]), (0, W - r.shape[1]))
        rgb[v] = np.pad(r, pad + ((0, 0),) * (r.ndim - 2))
    return gray, rgb, (H, W)


def compute_depth_maps(scene: Scene, images: Sequence[np.ndarray],
                       params: PlaneSweepParams) -> Dict[int, DepthMapResult]:
    """Plane-sweep every posed view. One jitted program (static shapes),
    views looped on host — the TPU analogue of the per-cluster pmvs2 loop."""
    views = _posed_views(scene)
    if len(views) < 2:
        return {}
    sources = select_sources(scene, params.num_sources)
    gray, _rgb, _hw = _prep_images(images, scene, views, params.level)
    pid = np.asarray(scene.views.pose_id)
    Rs = np.asarray(scene.poses.R)
    Cs = np.asarray(scene.poses.C)

    S = params.num_sources
    out: Dict[int, DepthMapResult] = {}
    for v in views:
        srcs = sources.get(v, [])
        rng = depth_range(scene, v)
        if not srcs or rng is None:
            continue
        depths = planesweep.inverse_depth_planes(rng[0], rng[1],
                                                 params.num_planes)
        K_ref = _K_for(scene, v, params.level)
        src_ids = (srcs + [srcs[0]] * S)[:S]
        live = np.array([i < len(srcs) for i in range(S)])
        homos = planesweep.plane_homographies(
            K_ref, Rs[pid[v]], Cs[pid[v]],
            np.stack([_K_for(scene, s, params.level) for s in src_ids]),
            Rs[pid[src_ids]], Cs[pid[src_ids]], depths)
        idepth, ncc = planesweep.sweep(
            jnp.asarray(gray[v]),
            jnp.asarray(np.stack([gray[s] for s in src_ids])),
            jnp.asarray(live),
            jnp.asarray(homos, jnp.float32),
            jnp.asarray(1.0 / depths, jnp.float32),
            wsize=params.wsize,
            top_k=min(params.agg_top_k, len(srcs)),
            chunk=params.plane_chunk)
        idepth = np.asarray(idepth)
        ncc = np.asarray(ncc)
        out[v] = DepthMapResult(
            view_id=v, idepth=idepth, ncc=ncc,
            valid=ncc >= params.threshold, K=K_ref, sources=srcs)
    return out


def compute_depth_maps_sharded(scene: Scene, images: Sequence[np.ndarray],
                               params: PlaneSweepParams, mesh,
                               axis: str = "views"
                               ) -> Dict[int, DepthMapResult]:
    """Mesh-sharded plane sweep: reference views are data-parallel over the
    ``axis`` mesh dimension (the TPU counterpart of CMVS farming PMVS
    clusters to processes, src/R3DDensificationProcess.cpp:239-263).

    One vmapped sweep program, view batch sharded with NamedSharding; XLA
    partitions the batch across devices with no collectives (the sweep is
    embarrassingly parallel per view). Matches the host-loop
    :func:`compute_depth_maps` when views have equal source counts (the
    batched program uses one top_k = the minimum live source count)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    views = _posed_views(scene)
    if len(views) < 2:
        return {}
    sources = select_sources(scene, params.num_sources)
    gray, _rgb, _hw = _prep_images(images, scene, views, params.level)
    pid = np.asarray(scene.views.pose_id)
    Rs = np.asarray(scene.poses.R)
    Cs = np.asarray(scene.poses.C)

    S = params.num_sources
    live_views, refs, srcs_b, live_b, homos_b, idep_b = [], [], [], [], [], []
    for v in views:
        srcs = sources.get(v, [])
        rng = depth_range(scene, v)
        if not srcs or rng is None:
            continue
        depths = planesweep.inverse_depth_planes(rng[0], rng[1],
                                                 params.num_planes)
        K_ref = _K_for(scene, v, params.level)
        src_ids = (srcs + [srcs[0]] * S)[:S]
        homos = planesweep.plane_homographies(
            K_ref, Rs[pid[v]], Cs[pid[v]],
            np.stack([_K_for(scene, s, params.level) for s in src_ids]),
            Rs[pid[src_ids]], Cs[pid[src_ids]], depths)
        live_views.append(v)
        refs.append(gray[v])
        srcs_b.append(np.stack([gray[s] for s in src_ids]))
        live_b.append([i < len(srcs) for i in range(S)])
        homos_b.append(homos.astype(np.float32))
        idep_b.append((1.0 / depths).astype(np.float32))
    if not live_views:
        return {}

    n_dev = mesh.shape[axis]
    B = len(live_views)
    pad = (-B) % n_dev
    for _ in range(pad):   # pad with copies of the first problem
        refs.append(refs[0])
        srcs_b.append(srcs_b[0])
        live_b.append(live_b[0])
        homos_b.append(homos_b[0])
        idep_b.append(idep_b[0])

    top_k = min(params.agg_top_k,
                min(int(np.sum(lv)) for lv in live_b[:B]))
    sweep_b = jax.jit(
        jax.vmap(lambda r, s, lv, hm, idp: planesweep.sweep(
            r, s, lv, hm, idp, wsize=params.wsize, top_k=top_k,
            chunk=params.plane_chunk)),
        in_shardings=NamedSharding(mesh, P(axis)),
        out_shardings=NamedSharding(mesh, P(axis)))
    idepth_b, ncc_b = sweep_b(
        jnp.asarray(np.stack(refs)), jnp.asarray(np.stack(srcs_b)),
        jnp.asarray(np.stack(live_b)), jnp.asarray(np.stack(homos_b)),
        jnp.asarray(np.stack(idep_b)))
    idepth_b = np.asarray(idepth_b)
    ncc_b = np.asarray(ncc_b)

    out: Dict[int, DepthMapResult] = {}
    for i, v in enumerate(live_views):
        out[v] = DepthMapResult(
            view_id=v, idepth=idepth_b[i], ncc=ncc_b[i],
            valid=ncc_b[i] >= params.threshold,
            K=_K_for(scene, v, params.level), sources=sources[v])
    return out


def fuse_depth_maps(scene: Scene, images: Sequence[np.ndarray],
                    dmaps: Dict[int, DepthMapResult],
                    params: PlaneSweepParams, csize: int = 2,
                    min_consistent: int = 2, tol: float = 0.01):
    """Consistency-filter + fuse all depth maps; returns (xyz, nrm, rgb)."""
    views = sorted(dmaps.keys())
    hw0 = dmaps[views[0]].idepth.shape if views else None
    _gray, rgb, _hw = _prep_images(images, scene, views, params.level,
                                   target_hw=hw0)
    pid = np.asarray(scene.views.pose_id)
    Rs = np.asarray(scene.poses.R)
    Cs = np.asarray(scene.poses.C)

    all_xyz, all_nrm, all_rgb = [], [], []
    S = params.num_sources
    for v in views:
        dm = dmaps[v]
        srcs = [s for s in dm.sources if s in dmaps]
        if not srcs:
            continue
        src_ids = (srcs + [srcs[0]] * S)[:S]
        live = np.array([i < len(srcs) for i in range(S)])
        accept, X = fusion.consistency_mask(
            jnp.asarray(dm.idepth), jnp.asarray(dm.valid),
            jnp.asarray(dm.K, jnp.float32),
            jnp.asarray(Rs[pid[v]], jnp.float32),
            jnp.asarray(Cs[pid[v]], jnp.float32),
            jnp.asarray(np.stack([dmaps[s].idepth for s in src_ids]),
                        jnp.float32),
            jnp.asarray(np.stack([dmaps[s].valid for s in src_ids])),
            jnp.asarray(np.stack([dmaps[s].K for s in src_ids]),
                        jnp.float32),
            jnp.asarray(Rs[pid[src_ids]], jnp.float32),
            jnp.asarray(Cs[pid[src_ids]], jnp.float32),
            jnp.asarray(live), tol=tol,
            min_consistent=min(min_consistent, len(srcs)))
        nrm = fusion.smoothed_normals(
            jnp.asarray(dm.idepth), jnp.asarray(dm.valid),
            jnp.asarray(dm.K, jnp.float32),
            jnp.asarray(Rs[pid[v]], jnp.float32),
            jnp.asarray(Cs[pid[v]], jnp.float32))
        rgb_v = rgb[v]
        if rgb_v.ndim == 2:
            rgb_v = np.repeat(rgb_v[..., None], 3, -1)
        xyz, n, c = fusion.fuse_points(np.asarray(accept), np.asarray(X),
                                       np.asarray(nrm), rgb_v, csize)
        all_xyz.append(xyz)
        all_nrm.append(n)
        all_rgb.append(c)
    if not all_xyz:
        z = np.zeros((0, 3))
        return z, z.copy(), z.copy()
    return (np.concatenate(all_xyz), np.concatenate(all_nrm),
            np.concatenate(all_rgb))


def densify_scene(scene: Scene, images: Sequence[np.ndarray],
                  level: int = 1, num_planes: int = 96, wsize: int = 7,
                  threshold: float = 0.7, num_sources: int = 6,
                  csize: int = 2, min_image_num: int = 3,
                  depth_tol: float = 0.01, mesh=None):
    """End-to-end native densification: scene + images -> point cloud.

    ``min_image_num`` counts the reference view itself (PMVS semantics),
    so the cross-view vote needs ``min_image_num - 1`` agreeing sources.
    Pass a ``jax.sharding.Mesh`` with a ``views`` axis to shard the sweep
    over devices."""
    params = PlaneSweepParams(level=level, num_planes=num_planes,
                              wsize=wsize, threshold=threshold,
                              num_sources=num_sources)
    if mesh is not None:
        dmaps = compute_depth_maps_sharded(scene, images, params, mesh)
    else:
        dmaps = compute_depth_maps(scene, images, params)
    xyz, nrm, rgb = fuse_depth_maps(
        scene, images, dmaps, params, csize=csize,
        min_consistent=max(min_image_num - 1, 1), tol=depth_tol)
    return xyz, nrm, rgb, dmaps


def run_native_densification(project, triangulation_id: int, out_dir: str,
                             args) -> Dict:
    """Project-store entry point (dispatch target of ``densify --method
    tpu``); returns the same result dict as the external runners."""
    import os

    from regard3d_tpu.core import sfm_data
    from regard3d_tpu.export.ply import PlyData, write_ply
    from regard3d_tpu.ingest import image_io

    scene = sfm_data.load_npz(project.paths(triangulation_id).scene_npz)
    ps_obj = project.objects[project.objects[triangulation_id].parent_id]
    infos = project.objects[ps_obj.parent_id].params["image_info"]
    images = [image_io.load_rgb(i["path"]) for i in infos]

    mesh = None
    import jax
    if len(jax.devices()) > 1:       # shard views across the chips we have
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("views",))

    xyz, nrm, rgb, dmaps = densify_scene(
        scene, images,
        level=getattr(args, "level", 1),
        num_planes=getattr(args, "num_planes", 96),
        wsize=getattr(args, "wsize", 7),
        threshold=getattr(args, "threshold", 0.7),
        num_sources=getattr(args, "num_sources", 6),
        csize=getattr(args, "csize", 2),
        min_image_num=getattr(args, "min_image_num", 3),
        mesh=mesh)

    np.savez_compressed(
        os.path.join(out_dir, "depth_maps.npz"),
        **{f"idepth_{v}": d.idepth for v, d in dmaps.items()},
        **{f"ncc_{v}": d.ncc for v, d in dmaps.items()})
    dense = os.path.join(out_dir, "dense.ply")
    write_ply(dense, PlyData(xyz=xyz, rgb=(rgb * 255).astype(np.uint8),
                             normals=nrm))
    return {"method": "tpu", "dense_cloud": dense, "num_points": len(xyz),
            "num_depth_maps": len(dmaps)}
