"""Incremental SfM engine (sequential v1/v2 equivalents).

Rebuilds the observable behaviour of OpenMVG's
``SequentialSfMReconstructionEngine`` (+user initial pair, v1) and
``SequentialSfMReconstructionEngine2`` (MaxPair auto-initializer, v2) as
driven by the reference (``src/threads/R3DTriangulationThread.cpp:
418-441, 492-509``):

  initial pair -> robust E -> relative pose -> triangulate
  -> { pick best unposed view -> robust resection -> retriangulate
       -> bundle adjust -> reject outlier observations } until done
  -> final BA (+optional intrinsic refinement)

TPU decomposition: the outer *which-view-next* loop is inherently
data-dependent and stays on host; every step inside it is a fixed-shape
device program (vectorized ACRANSAC, whole-scene segment-sum triangulation,
Schur-LM BA).  The scene state lives in flat arrays the whole time.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.ba import lm
from regard3d_tpu.core import cameras
from regard3d_tpu.kernels import geometry, ransac
from regard3d_tpu.sfm import tracks as tracks_mod
from regard3d_tpu.sfm.triangulate import (reprojection_residuals_px,
                                          triangulate_tracks)


@dataclasses.dataclass(frozen=True)
class IncrementalConfig:
    max_err_px: float = 4.0            # ACRANSAC bound (reference: 4.0)
    ransac_iters: int = 1024
    resection_iters: int = 512
    min_resection_points: int = 12
    min_track_len: int = 2
    min_angle_deg: float = 2.0
    ba_every: int = 3                  # bundle adjust after this many views
    ba_iterations: int = 20
    final_ba_iterations: int = 40
    refine_intrinsics: bool = True     # ADJUST_ALL parity default
    huber_delta_px: float = 2.0
    min_initial_inliers: int = 50
    initializer: str = "maxpair"       # "maxpair" | "stellar" (v2 menu,
                                       # src/res/Regard3dMainFrameBase.fbp:9712)
    resection_group: int = 16          # max views resected per batched round
                                       # (SequentialSfMReconstructionEngine2
                                       # resects every adequate view of a
                                       # round before the next BA)
    resection_group_frac: float = 0.5   # group admits views with >= frac of
                                        # the best candidate's visible count


class SfMInputs(NamedTuple):
    """Static-shape scene inputs (built by the pipeline layer)."""
    xy: jnp.ndarray          # (O, 2) pixel coords per observation
    track_id: jnp.ndarray    # (O,)
    view_id: jnp.ndarray     # (O,)
    feature_id: jnp.ndarray  # (O,)
    num_tracks: int
    intr_id: jnp.ndarray     # (V,) per-view intrinsic group
    intr: jnp.ndarray        # (K, 9)
    models: jnp.ndarray      # (K,) camera model codes
    image_sizes: np.ndarray  # (V, 2) width, height


class SfMResult(NamedTuple):
    R: jnp.ndarray           # (V, 3, 3)
    C: jnp.ndarray           # (V, 3)
    pose_mask: np.ndarray    # (V,)
    X: jnp.ndarray           # (T, 3)
    track_ok: np.ndarray     # (T,)
    obs_active: np.ndarray   # (O,)
    intr: jnp.ndarray        # (K, 9)
    stats: Dict


def _bearings(inputs: SfMInputs, intr) -> jnp.ndarray:
    params = intr[inputs.intr_id[inputs.view_id]]
    model = inputs.models[inputs.intr_id[inputs.view_id]]
    return cameras.bearing(model, params, inputs.xy)


def _normalized_xy(inputs: SfMInputs, intr) -> jnp.ndarray:
    b = _bearings(inputs, intr)
    return b[:, :2] / b[:, 2:]


def _select_initial_pose(inputs: SfMInputs, table: tracks_mod.TrackTable,
                         key, cfg: IncrementalConfig, num_views: int,
                         xn: np.ndarray, top_k: int = 200,
                         attempts: int = 2):
    """Batched MaxPair initializer: ONE padded E-batch + H-batch dispatch
    validates the ``top_k`` most covisible candidate pairs, one batched
    cheirality-voting decomposition scores every surviving E, and the
    parallax gate picks the first viable pair — replacing the serial
    per-candidate RANSAC loop (on the TPU tunnel each dispatch costs more
    than the math).  ~ SfMSceneInitializerMaxPair + getBestValidatedPairs
    parity (src/utils/OpenMVGHelper.cpp:273-419; parallax gate = OpenMVG
    initializer's min-angle behaviour).

    Returns (i, j, Rrel, trel, oi, oj, inl) or None."""
    # top_k must reach past the most-covisible pairs: on a loop-closure
    # capture the highest-count pairs are coincident revisits (same spot,
    # ~zero baseline) that the parallax gate rightly rejects — with only
    # 50 candidates every one can be a revisit and init collapses.
    # Blocks short-circuit on the first viable pair, so the common case
    # still costs one dispatch.
    cand, counts = tracks_mod.covisibility_pairs(table, num_views,
                                                 min_count=30)
    pairs = [(int(c), int(i), int(j)) for c, (i, j) in zip(counts, cand)]
    # Coincident-revisit demotion: on a loop-closure capture the MOST
    # covisible pairs are two passes over the same spot — near-identical
    # poses whose matches have ~zero image displacement and ~zero
    # triangulation angle.  Seeding on one strands the model (the
    # min-angle triangulation gate rightly keeps ~nothing).  Median
    # matched-keypoint displacement is a few-microsecond host-side proxy
    # that separates them from real-baseline pairs BEFORE the expensive
    # E sweep: demoted pairs go to the back of the candidate order (they
    # remain fine for matching and BA, just not for initialization).
    promoted, demoted = [], []
    for cnt, i, j in pairs[:top_k * 4]:
        oi, oj = _pair_obs(inputs, i, j)
        if len(oi) < 16:
            continue
        f = float(inputs.intr[inputs.intr_id[i], 0])
        disp_px = f * np.median(
            np.linalg.norm(xn[oi] - xn[oj], axis=1))
        (demoted if disp_px < 2.0 * cfg.max_err_px else promoted).append(
            (i, j, oi, oj))
    items = (promoted + demoted)[:top_k]
    if not items:
        return None
    P = len(items)
    cap = max(64, 1 << int(np.ceil(np.log2(
        max(len(g[2]) for g in items)))))
    x1 = np.zeros((P, cap, 2), np.float32)
    x2 = np.zeros((P, cap, 2), np.float32)
    x1h = np.zeros((P, cap, 2), np.float32)
    x2h = np.zeros((P, cap, 2), np.float32)
    mask = np.zeros((P, cap), bool)
    la_e = np.zeros((P,), np.float32)
    me_e = np.zeros((P,), np.float32)
    la_h = np.zeros((P,), np.float32)
    me_h = np.full((P,), np.float32(cfg.max_err_px ** 2), np.float32)
    for bi, (i, j, oi, oj) in enumerate(items):
        n = len(oi)
        f = float(inputs.intr[inputs.intr_id[i], 0])
        x1[bi, :n] = xn[oi]
        x2[bi, :n] = xn[oj]
        x1h[bi, :n] = xn[oi] * f
        x2h[bi, :n] = xn[oj] * f
        mask[bi, :n] = True
        w = float(inputs.image_sizes[i][0]) or 2.0 * f
        h = float(inputs.image_sizes[i][1]) or 2.0 * f
        la_e[bi] = np.log10(2.0 * np.hypot(w, h) / (w * h) * f)
        me_e[bi] = (cfg.max_err_px / f) ** 2
        la_h[bi] = ransac._logalpha0_point(2.0 * f, 2.0 * f)

    h_ratio_threshold = 0.92
    best_low_parallax = None
    best_any = None
    best_scored = None     # (score, out) over ALL viable candidates
    # fixed (BLOCK, cap) chunks: candidate blocks are tried in
    # covisibility order and the first viable pair short-circuits the
    # rest — one E/H/decompose compile serves every block, and the
    # per-dispatch footprint stays bounded (the axon tunnel shadows
    # device intermediates in host RAM)
    BLOCK = 16
    for s0 in range(0, P, BLOCK):
        sl = slice(s0, min(s0 + BLOCK, P))
        Pb = sl.stop - sl.start
        pad_to = BLOCK
        x1b = np.zeros((pad_to, cap, 2), np.float32)
        x2b = np.zeros((pad_to, cap, 2), np.float32)
        x1hb = np.zeros((pad_to, cap, 2), np.float32)
        x2hb = np.zeros((pad_to, cap, 2), np.float32)
        maskb = np.zeros((pad_to, cap), bool)
        x1b[:Pb], x2b[:Pb] = x1[sl], x2[sl]
        x1hb[:Pb], x2hb[:Pb] = x1h[sl], x2h[sl]
        maskb[:Pb] = mask[sl]
        lab_e = np.zeros((pad_to,), np.float32)
        meb_e = np.full((pad_to,), 1.0, np.float32)
        lab_h = np.zeros((pad_to,), np.float32)
        meb_h = np.full((pad_to,), np.float32(cfg.max_err_px ** 2),
                        np.float32)
        lab_e[:Pb], meb_e[:Pb] = la_e[sl], me_e[sl]
        lab_h[:Pb] = la_h[sl]
        x1j, x2j = jnp.asarray(x1b), jnp.asarray(x2b)
        maskj = jnp.asarray(maskb)
        h_valid = h_num = None
        for attempt in range(attempts):
            key, k1, k2 = jax.random.split(key, 3)
            ke = jax.random.split(k1, pad_to)
            re = ransac.acransac_e_batch(ke, x1j, x2j, maskj,
                                         jnp.asarray(lab_e),
                                         jnp.asarray(meb_e),
                                         iters=cfg.ransac_iters)
            if attempt == 0:
                kh = jax.random.split(k2, pad_to)
                rh = ransac.acransac_h_batch(
                    kh, jnp.asarray(x1hb), jnp.asarray(x2hb), maskj,
                    jnp.asarray(lab_h), jnp.asarray(meb_h),
                    iters=min(cfg.ransac_iters, 512))
                h_valid = np.asarray(rh.valid)
                h_num = np.asarray(rh.num_inliers)
            # one batched decomposition for every candidate's best E
            # model; only inlier correspondences vote cheirality
            inl_dev = re.inliers & maskj
            Rb, tb, nval = geometry.decompose_essential(
                re.model, x1j, x2j, mask=inl_dev)
            e_valid = np.asarray(re.valid)
            e_num = np.asarray(re.num_inliers)
            inl_np = np.asarray(inl_dev)
            Rb_np, tb_np = np.asarray(Rb), np.asarray(tb)
            frac = np.asarray(nval) / np.maximum(e_num, 1)

            for bi in range(Pb):
                i, j, oi, oj = items[s0 + bi]
                if not e_valid[bi] or e_num[bi] < cfg.min_initial_inliers:
                    continue
                if frac[bi] < 0.7:
                    cand_t = (frac[bi], s0 + bi, Rb_np[bi], tb_np[bi],
                              inl_np[bi][:len(oi)])
                    if best_any is None or frac[bi] > best_any[0]:
                        best_any = cand_t
                    continue
                inl = inl_np[bi][:len(oi)]
                # parallax gate (OpenMVG initializer behaviour): a pair
                # whose median triangulation angle is under min-angle
                # would triangulate nothing (forward-motion pairs)
                r1 = np.concatenate([xn[oi[inl]],
                                     np.ones((int(inl.sum()), 1))], 1)
                r2 = np.concatenate([xn[oj[inl]],
                                     np.ones((int(inl.sum()), 1))], 1)
                r1 /= np.linalg.norm(r1, axis=1, keepdims=True)
                r2w = r2 @ Rb_np[bi]
                r2w /= np.linalg.norm(r2w, axis=1, keepdims=True)
                cosang = np.clip((r1 * r2w).sum(1), -1.0, 1.0)
                med_deg = float(np.degrees(np.median(np.arccos(cosang))))
                out = (i, j, Rb_np[bi], tb_np[bi], oi, oj, inl)
                if med_deg < cfg.min_angle_deg:
                    # keep the HIGHEST-parallax gated candidate, not the
                    # first: covisibility order puts coincident loop-
                    # closure revisits (same spot, ~0 deg rays, nothing
                    # triangulable) at the front, and initializing on one
                    # strands the whole reconstruction at 2 views/1 track
                    if (best_low_parallax is None
                            or med_deg > best_low_parallax[0]):
                        best_low_parallax = (med_deg, out)
                    continue
                # viable — but do NOT return the first one: a pair that
                # scrapes past min-angle (RANSAC-noise flaky near the
                # threshold) triangulates marginally and can strand the
                # model, while a solidly-wider pair a block later seeds
                # hundreds of tracks.  Score inliers x clamped median
                # angle, planar-dominated pairs heavily penalized
                # (H explaining >=92% of matches = rotation/plane
                # degenerate, OpenMVG drops these).
                planar = (h_valid[bi]
                          and h_num[bi] >= h_ratio_threshold
                          * maskb[bi].sum())
                score = (e_num[bi] * np.radians(min(med_deg, 10.0))
                         * (0.1 if planar else 1.0))
                if best_scored is None or score > best_scored[0]:
                    best_scored = (score, med_deg, out)
            if best_scored is not None:
                # further same-block attempts only re-draw RANSAC noise
                break
        # stop scanning once a solidly-wide viable pair is in hand
        # (candidates are covisibility-sorted: later blocks have fewer
        # matches and rarely score higher); a merely-marginal best keeps
        # the scan going
        if (best_scored is not None
                and best_scored[1] >= 1.5 * cfg.min_angle_deg):
            break
    if best_scored is not None:
        return best_scored[2]
    if best_low_parallax is not None:
        # everything is low-parallax (e.g. pure forward motion with a
        # short window): the HIGHEST-parallax candidate — after the
        # coincident-pair demotion above this is a real-baseline pair
        # whenever one exists in the pool
        return best_low_parallax[1]
    if best_any is not None:
        _, bi, Rb_b, tb_b, inl = best_any
        i, j, oi, oj = items[bi]
        return (i, j, Rb_b, tb_b, oi, oj, inl)
    return None


def select_initial_pair(inputs: SfMInputs, table: tracks_mod.TrackTable,
                        key, cfg: IncrementalConfig,
                        num_views: int) -> Optional[Tuple[int, int]]:
    xn = np.asarray(_normalized_xy(inputs, inputs.intr))
    sel = _select_initial_pose(inputs, table, key, cfg, num_views, xn)
    return (sel[0], sel[1]) if sel else None


def _relative_pose(inputs: SfMInputs, xn, i: int, j: int, key, cfg,
                   attempts: int = 4, min_valid_frac: float = 0.7):
    """Robust relative pose for a pair: ACRANSAC E + decomposition, with a
    cheirality acceptance gate.  An E model can score well a-contrario yet
    decompose into a twisted pose where only ~half the inliers sit in
    front of both cameras — such draws are retried with fresh randomness
    (OpenMVG's RelativePose does full cheirality-checked estimation).

    Returns (Rrel, trel, oi, oj, inl) with view j's pose in i's frame, or
    None."""
    best = None
    for _ in range(attempts):
        key, k = jax.random.split(key)
        two = _two_view_geometry(inputs, xn, i, j, k, cfg)
        if two is None:
            continue
        E, (oi, oj, inl_pad, n_pair), _, n_inl = two
        inl = np.asarray(inl_pad)[:n_pair]
        x1 = jnp.asarray(xn[oi[inl]])
        x2 = jnp.asarray(xn[oj[inl]])
        Rrel, trel, nval = geometry.decompose_essential(E[None], x1[None],
                                                        x2[None])
        frac = float(np.asarray(nval)[0]) / max(int(n_inl), 1)
        cand = (frac, np.asarray(Rrel[0]), np.asarray(trel[0]), oi, oj, inl)
        if best is None or frac > best[0]:
            best = cand
        if frac >= min_valid_frac:
            break
    if best is None or best[0] < min_valid_frac:
        return None
    return best[1:]


def _pair_is_planar(inputs, xn, i, j, key, cfg,
                    h_ratio_threshold: float = 0.92) -> bool:
    """True when a robust homography explains nearly all of the pair's
    correspondences (planar scene / pure rotation -> degenerate E)."""
    oi, oj = _pair_obs(inputs, i, j)
    n = len(oi)
    if n < 16:
        return False
    cap = max(64, 1 << int(np.ceil(np.log2(n))))
    pad = cap - n
    f = float(inputs.intr[inputs.intr_id[i], 0])
    x1 = jnp.asarray(np.pad(xn[oi] * f, ((0, pad), (0, 0))))
    x2 = jnp.asarray(np.pad(xn[oj] * f, ((0, pad), (0, 0))))
    mask = jnp.asarray(np.arange(cap) < n)
    res = ransac.acransac_h(key, x1, x2, mask, 2.0 * f, 2.0 * f,
                            iters=min(cfg.ransac_iters, 512),
                            max_err_px=cfg.max_err_px)
    return bool(res.valid) and int(res.num_inliers) >= h_ratio_threshold * n


def _pair_obs(inputs: SfMInputs, i: int, j: int):
    """Indices of observations forming tracks shared by views i and j.
    Returns (obs_i, obs_j) aligned arrays of observation row indices."""
    vid = np.asarray(inputs.view_id)
    tid = np.asarray(inputs.track_id)
    rows_i = np.where(vid == i)[0]
    rows_j = np.where(vid == j)[0]
    ti = tid[rows_i]
    tj = tid[rows_j]
    common, ii, jj = np.intersect1d(ti, tj, return_indices=True)
    return rows_i[ii], rows_j[jj]


def _two_view_geometry(inputs, xn, i, j, key, cfg):
    oi, oj = _pair_obs(inputs, i, j)
    n = len(oi)
    if n < 16:
        return None
    cap = max(64, 1 << int(np.ceil(np.log2(n))))
    pad = cap - n
    x1 = jnp.asarray(np.pad(xn[oi], ((0, pad), (0, 0))))
    x2 = jnp.asarray(np.pad(xn[oj], ((0, pad), (0, 0))))
    mask = jnp.asarray(np.arange(cap) < n)
    f = float(inputs.intr[inputs.intr_id[i], 0])
    res = ransac.acransac_e(key, x1, x2, mask, focal_px=f,
                            iters=cfg.ransac_iters,
                            max_err_px=cfg.max_err_px)
    if not bool(res.valid):
        return None
    return res.model, (oi, oj, res.inliers, n), x1, res.num_inliers


def _midpoint_hub_depths(xh: np.ndarray, xv: np.ndarray,
                         Rj: np.ndarray, Cj: np.ndarray) -> np.ndarray:
    """Hub-frame depths of two-ray midpoints.  ``xh``/``xv``: (N, 2)
    normalized coords in the hub / neighbour cameras; ``Rj``, ``Cj``: the
    neighbour pose in the hub frame (x_cam = Rj (X - Cj)).  Negative or
    ill-conditioned rows come back <= 0."""
    dh = np.concatenate([xh, np.ones((len(xh), 1))], 1)
    dh /= np.linalg.norm(dh, axis=1, keepdims=True)
    dv = np.concatenate([xv, np.ones((len(xv), 1))], 1) @ Rj  # R^T x
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    dhv = np.sum(dh * dv, 1)
    det = 1.0 - dhv * dhv
    t = (dh @ Cj - dhv * (dv @ Cj)) / np.maximum(det, 1e-9)
    t = np.where(det > 1e-9, t, -1.0)
    return t * dh[:, 2]


def _stellar_seed(inputs: SfMInputs, table: tracks_mod.TrackTable,
                  key, cfg: IncrementalConfig, num_views: int,
                  xn: np.ndarray, max_branches: int = 6):
    """Stellar initializer: a local reconstruction around the best-connected
    hub view (SfMSceneInitializerStellar behaviour, selected by the v2
    engine menu — src/threads/R3DTriangulationThread.cpp:492-498).

    1. hub = view with the largest summed co-visibility;
    2. each hub edge gets a robust relative pose (unit baseline) and hub-ray
       depths for its inlier tracks;
    3. per-edge baseline scales are reconciled by a log-least-squares over
       the depth ratios of tracks shared between edges;
    4. every connected branch becomes a seeded pose.

    Returns (hub, {view: (R, C)}, deactivate_rows) or None when fewer than
    two branches survive (caller falls back to MaxPair)."""
    cand, counts = tracks_mod.covisibility_pairs(table, num_views,
                                                 min_count=30)
    if len(cand) == 0:
        return None
    strength = np.zeros(num_views, np.int64)
    np.add.at(strength, cand[:, 0], counts)
    np.add.at(strength, cand[:, 1], counts)
    hub = int(np.argmax(strength))
    on_hub = (cand[:, 0] == hub) | (cand[:, 1] == hub)
    branches = [int(a if b == hub else b)
                for a, b in cand[on_hub][:2 * max_branches]]

    tid_np = np.asarray(inputs.track_id)
    edges = []    # (view, R, C_unit, {track: depth}, deact_rows)
    for v in branches:
        if len(edges) >= max_branches:
            break
        key, k = jax.random.split(key)
        i, j = min(hub, v), max(hub, v)
        if _pair_is_planar(inputs, xn, i, j, k, cfg):
            # H-degenerate hub edge: its E decomposition is unreliable and
            # would poison the pod's scale graph — leave the view to the
            # resection stage instead
            continue
        rel = _relative_pose(inputs, xn, i, j, k, cfg)
        if rel is None:
            continue
        # estimation frame: view i at identity; pose of j is
        # x_j = Rrel (X - Cj') with Cj' = -Rrel^T trel
        Rrel, trel, oi, oj, inl = rel
        if int(inl.sum()) < cfg.min_initial_inliers:
            continue
        if hub == i:
            Rj, Cj = Rrel, -Rrel.T @ trel            # v's pose in hub frame
            oh, ov = oi, oj
        else:
            # estimated hub-in-v; invert to v-in-hub: R_v = Rrel^T, C_v = t
            Rj, Cj = Rrel.T, trel
            oh, ov = oj, oi
        depths = _midpoint_hub_depths(xn[oh[inl]], xn[ov[inl]], Rj, Cj)
        good = depths > 1e-6
        if good.sum() < cfg.min_initial_inliers // 2:
            continue
        dmap = dict(zip(tid_np[oh[inl]][good].tolist(),
                        depths[good].tolist()))
        # neighbour-view rows are tested by exactly one hub edge -> safe to
        # deactivate outright; hub-view rows are shared across edges, so
        # record in/out sets and deactivate only rows that are E-outliers
        # in EVERY edge that tested them (an observation inlying one edge
        # is geometrically supported and must keep its pod track support)
        edges.append((v, Rj, Cj, dmap, ov[~inl], oh[inl], oh[~inl]))

    if len(edges) < 2:
        return None

    # --- reconcile per-edge baseline scales (log least squares) -----------
    k_e = len(edges)
    rows, rhs = [], []
    for a in range(k_e):
        for b in range(a + 1, k_e):
            da, db = edges[a][3], edges[b][3]
            common = set(da) & set(db)
            if len(common) < 5:
                continue
            logr = np.log([da[t] / db[t] for t in common
                           if da[t] > 0 and db[t] > 0])
            if len(logr) < 5:
                continue
            row = np.zeros(k_e)
            row[a], row[b] = 1.0, -1.0
            rows.append(row)
            rhs.append(-float(np.median(logr)))   # s_a d_a = s_b d_b
    if not rows:
        return None
    # connectivity: keep only edges reachable from edge 0 through constraints
    adj = [set() for _ in range(k_e)]
    for row in rows:
        a, b = int(np.argmax(row)), int(np.argmin(row))
        adj[a].add(b)
        adj[b].add(a)
    seen = {0}
    stack = [0]
    while stack:
        n = stack.pop()
        for m in adj[n]:
            if m not in seen:
                seen.add(m)
                stack.append(m)
    keep = sorted(seen)
    if len(keep) < 2:
        return None
    remap = {e: i for i, e in enumerate(keep)}
    A = np.zeros((len(rows) + 1, len(keep)))
    bvec = np.zeros(len(rows) + 1)
    nrow = 0
    for row, r in zip(rows, rhs):
        a, b = int(np.argmax(row)), int(np.argmin(row))
        if a in remap and b in remap:
            A[nrow, remap[a]] = 1.0
            A[nrow, remap[b]] = -1.0
            bvec[nrow] = r
            nrow += 1
    A[nrow, 0] = 1.0          # anchor: first edge scale = 1
    bvec[nrow] = 0.0
    logs = np.linalg.lstsq(A[:nrow + 1], bvec[:nrow + 1], rcond=None)[0]
    scales = np.exp(logs)

    poses = {hub: (np.eye(3), np.zeros(3))}
    deact_nbr, hub_in, hub_out = [], [], []
    for i, e in enumerate(keep):
        v, Rj, Cj, _, deact_v, oh_in, oh_out = edges[e]
        poses[v] = (Rj, Cj * scales[i])
        deact_nbr.append(deact_v)
        hub_in.append(oh_in)
        hub_out.append(oh_out)
    # hub rows: outlier in every edge that tested them (set intersection)
    hub_deact = np.setdiff1d(np.concatenate(hub_out),
                             np.concatenate(hub_in))
    deact_all = np.concatenate(deact_nbr + [hub_deact])
    return hub, poses, deact_all


def run_incremental(inputs: SfMInputs,
                    initial_pair: Optional[Tuple[int, int]] = None,
                    cfg: IncrementalConfig = IncrementalConfig(),
                    seed: int = 0,
                    verbose: bool = False,
                    center_priors=None,
                    prior_weight: float = 1.0) -> SfMResult:
    """Run the incremental pipeline. ``initial_pair=None`` auto-selects
    (v2 MaxPair behaviour); passing a pair reproduces v1.

    ``center_priors``: optional (V, 3) camera-center priors in a local
    metric frame (GPS->ENU). The reconstruction runs in a free gauge and
    is Sim3-aligned to the priors before a final prior-constrained BA
    (the reference's use-GPS / ViewPriors option)."""
    key = jax.random.PRNGKey(seed)
    V = inputs.intr_id.shape[0]
    T = inputs.num_tracks
    O = inputs.xy.shape[0]
    dtype = inputs.xy.dtype

    intr = jnp.asarray(inputs.intr, dtype)
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (V, 3, 3))
    C = jnp.zeros((V, 3), dtype)
    pose_mask = np.zeros(V, bool)
    obs_active = np.ones(O, bool)
    track_ok = np.zeros(T, bool)
    X = jnp.zeros((T, 3), dtype)

    table = tracks_mod.TrackTable(np.asarray(inputs.track_id),
                                  np.asarray(inputs.view_id),
                                  np.asarray(inputs.feature_id), T)

    # --- initialization: stellar pod or initial pair ----------------------
    t_init0 = time.perf_counter()
    xn = np.asarray(_normalized_xy(inputs, intr))
    pod_size = 0
    if initial_pair is None and cfg.initializer == "stellar":
        key, ks = jax.random.split(key)
        seed = _stellar_seed(inputs, table, ks, cfg, V, xn)
        if seed is not None:
            hub, poses, deact = seed
            i0 = hub
            for v, (Rv, Cv) in poses.items():
                R = R.at[v].set(jnp.asarray(Rv, dtype))
                C = C.at[v].set(jnp.asarray(Cv, dtype))
                pose_mask[v] = True
            obs_active[deact] = False
            pod_size = len(poses)
    if pod_size == 0:
        if initial_pair is not None:
            # v1: the user's pair — serial robust pose with retries
            i0, j0 = initial_pair
            key, k1, k2 = jax.random.split(key, 3)
            rel = (_relative_pose(inputs, xn, i0, j0, k1, cfg)
                   or _relative_pose(inputs, xn, i0, j0, k2, cfg,
                                     attempts=1, min_valid_frac=0.0))
            if rel is None:
                raise ValueError(
                    f"initial pair {initial_pair} has no robust E")
            Rrel, trel, oi, oj, inl = rel
        else:
            key, k1 = jax.random.split(key)
            sel = _select_initial_pose(inputs, table, k1, cfg, V, xn)
            if sel is None:
                raise ValueError(
                    "no initial pair with a cheirality-consistent pose")
            i0, j0, Rrel, trel, oi, oj, inl = sel

        R = R.at[j0].set(jnp.asarray(Rrel, dtype))
        C = C.at[j0].set(jnp.asarray(-Rrel.T @ trel, dtype))
        pose_mask[[i0, j0]] = True

        # deactivate pair observations that failed the E filter
        obs_active[oi[~inl]] = False
        obs_active[oj[~inl]] = False

    _init_elapsed = time.perf_counter() - t_init0

    # jitted helpers -------------------------------------------------------
    tid = jnp.asarray(inputs.track_id)
    vid = jnp.asarray(inputs.view_id)
    iid = jnp.asarray(inputs.intr_id)

    mean_focal = float(np.mean(np.asarray(inputs.intr)[:, 0]))

    @jax.jit
    def triangulate_all(R, C, pmask, oactive, intr):
        b = _bearings(inputs, intr)
        return triangulate_tracks(R, C, pmask, tid, vid, oactive, b, T,
                                  cfg.min_angle_deg, cfg.max_err_px,
                                  mean_focal)

    @jax.jit
    def residuals_px(R, C, X, intr):
        return reprojection_residuals_px(R, C, intr, inputs.models, iid[vid],
                                         vid, tid, X, inputs.xy)

    # stage-internal profile (VERDICT r4 item 2: committed breakdown of
    # where incremental-SfM wall-clock goes)
    prof = {"resection_s": 0.0, "triangulation_s": 0.0, "ba_s": 0.0,
            "outlier_s": 0.0, "host_s": 0.0, "init_s": _init_elapsed,
            "resection_rounds": 0, "ba_rounds": 0, "ba_iters": 0}

    def retriangulate():
        nonlocal X, track_ok
        t0 = time.perf_counter()
        tri = triangulate_all(R, C, jnp.asarray(pose_mask),
                              jnp.asarray(obs_active), intr)
        X = tri.X
        track_ok = np.array(tri.ok)      # writable: patched per-view below
        prof["triangulation_s"] += time.perf_counter() - t0

    # NOTE on retriangulation granularity: a touched-tracks-only variant
    # (earlier rounds) saved device FLOPs but cost one freshly-compiled
    # program per (o_cap, t_cap) bucket plus extra host<->device hops; on
    # the TPU the full-scene segment-sum triangulation is ONE cached
    # program whose per-call device time is microseconds-per-10k-obs, so
    # full retriangulation after every change is strictly faster at every
    # scale measured (200-1000 views).
    retriangulate()

    ba_layout_cache = []     # computed once: index tables never change

    def run_ba(iterations, refine):
        nonlocal R, C, X, intr
        t0 = time.perf_counter()
        w = (obs_active & track_ok[np.asarray(tid)]
             & pose_mask[np.asarray(vid)])
        obs_ba = lm.BAObservations(
            view_id=vid, intr_id=iid[vid], point_id=tid,
            model=inputs.models[iid[vid]], xy=inputs.xy,
            weight=jnp.asarray(w, dtype))
        if not ba_layout_cache:
            ba_layout_cache.append(lm.make_layout(
                obs_ba, V, T, int(inputs.intr.shape[0])))
        fixed = jnp.asarray(~pose_mask | (np.arange(V) == i0))
        state = lm.BAState(R=R, C=C, intr=intr, X=X)
        opts = lm.BAOptions(max_iterations=iterations,
                            refine_intrinsics=refine,
                            huber_delta_px=cfg.huber_delta_px)
        out, stats = lm.bundle_adjust(state, obs_ba, opts,
                                      fixed_pose_mask=fixed,
                                      layout=ba_layout_cache[0])
        R, C, intr, X = out.R, out.C, out.intr, out.X
        jax.block_until_ready(C)
        prof["ba_s"] += time.perf_counter() - t0
        prof["ba_rounds"] += 1
        prof["ba_iters"] += stats.iterations
        return stats

    def reject_outliers():
        nonlocal obs_active
        t0 = time.perf_counter()
        r2 = np.asarray(residuals_px(R, C, X, intr))
        live = (obs_active & track_ok[np.asarray(tid)]
                & pose_mask[np.asarray(vid)])
        bad = live & (r2 > cfg.max_err_px ** 2)
        obs_active &= ~bad
        prof["outlier_s"] += time.perf_counter() - t0
        return int(bad.sum())

    run_ba(cfg.ba_iterations, False)
    retriangulate()

    # --- grow -------------------------------------------------------------
    # Views are added in batched GROUPS: every candidate whose visible-track
    # count is within resection_group_frac of the best one is resected in a
    # single vmapped ACRANSAC dispatch, then the union of touched tracks is
    # retriangulated once.  This matches the reference v2 engine's
    # ResectionGroup behaviour (SequentialSfMReconstructionEngine2 resects
    # all adequate views of a round before the next BA) and cuts the number
    # of device round-trips from O(V) to O(V / group).
    vid_np = np.asarray(inputs.view_id)
    tid_np = np.asarray(inputs.track_id)
    # CSR rows-of-view index (host): avoids an O(O) np.where per candidate
    _order_v = np.argsort(vid_np, kind="stable")
    _v_starts = np.searchsorted(vid_np[_order_v], np.arange(V + 1))
    rows_of_view = lambda v: _order_v[_v_starts[v]:_v_starts[v + 1]]

    # FIXED batch geometry for resection: per-view row counts only ever
    # shrink, so one (P_cap, cap) shape serves every round -> exactly one
    # compiled resection program per scene (shape churn through the TPU
    # tunnel costs more than the padded FLOPs)
    _counts0 = np.bincount(vid_np, minlength=V)
    cap_res = max(64, 1 << int(np.ceil(np.log2(
        max(int(_counts0.max()), 1)))))
    P_cap_res = 1 << int(np.ceil(np.log2(max(cfg.resection_group, 1))))

    added_since_ba = 0
    order_added = [int(v) for v in np.nonzero(pose_mask)[0]]
    failed_at: Dict[int, int] = {}     # view -> score when resection failed
    while True:
        # candidate views scored by #visible triangulated tracks (one
        # bincount pass); a view that failed resection is retried only
        # once its score grows 20%
        t_host = time.perf_counter()
        vis_rows = obs_active & track_ok[tid_np]
        scores = np.bincount(vid_np[vis_rows], minlength=V)
        cand_scores = {}
        for v in np.nonzero(~pose_mask)[0]:
            vis = int(scores[v])
            if vis < cfg.min_resection_points:
                continue
            if v in failed_at and vis < 1.2 * failed_at[v]:
                continue
            cand_scores[int(v)] = vis
        if not cand_scores:
            break
        best_score = max(cand_scores.values())
        thresh = max(cfg.min_resection_points,
                     int(cfg.resection_group_frac * best_score))
        group = sorted((v for v, s in cand_scores.items() if s >= thresh),
                       key=lambda v: -cand_scores[v])
        group = group[:max(1, cfg.resection_group)]

        # fixed-shape padded batch (see cap_res/P_cap_res above)
        g_rows = []
        for v in group:
            rows = rows_of_view(v)
            rows = rows[obs_active[rows]]
            rows = rows[track_ok[tid_np[rows]]]
            g_rows.append(rows)
        cap = cap_res
        P = len(group)
        P_cap = P_cap_res
        Xh = np.asarray(X)
        intr_np = np.asarray(intr)
        Xv = np.zeros((P_cap, cap, 3), Xh.dtype)
        xv = np.zeros((P_cap, cap, 2), xn.dtype)
        maskv = np.zeros((P_cap, cap), bool)
        max_err = np.full((P_cap,), 1.0, np.float32)
        for bi, (v, rows) in enumerate(zip(group, g_rows)):
            n = len(rows)
            Xv[bi, :n] = Xh[tid_np[rows]]
            xv[bi, :n] = xn[rows]
            maskv[bi, :n] = True
            f = float(intr_np[inputs.intr_id[v], 0])
            max_err[bi] = (cfg.max_err_px / f) ** 2
        key, k2 = jax.random.split(key)
        keys = jax.random.split(k2, P_cap)
        prof["host_s"] += time.perf_counter() - t_host

        t_res = time.perf_counter()
        rr = ransac.acransac_resection_batch(
            keys, jnp.asarray(Xv), jnp.asarray(xv), jnp.asarray(maskv),
            jnp.asarray(max_err, Xh.dtype), iters=cfg.resection_iters)
        valid = np.asarray(rr.valid)
        inl_all = np.asarray(rr.inliers)
        prof["resection_s"] += time.perf_counter() - t_res
        prof["resection_rounds"] += 1

        t_host = time.perf_counter()
        accepted = [bi for bi in range(P) if valid[bi]]
        for bi in range(P):
            v = group[bi]
            if valid[bi]:
                failed_at.pop(v, None)
            else:
                failed_at[v] = cand_scores[v]
        if accepted:
            acc_views = np.asarray([group[bi] for bi in accepted], np.int32)
            acc_idx = jnp.asarray(np.asarray(accepted, np.int32))
            R = R.at[jnp.asarray(acc_views)].set(rr.R[acc_idx])
            C = C.at[jnp.asarray(acc_views)].set(rr.C[acc_idx])
            pose_mask[acc_views] = True
            order_added.extend(int(v) for v in acc_views)
            for bi in accepted:
                rows = g_rows[bi]
                out_rows = rows[~inl_all[bi, :len(rows)]]
                obs_active[out_rows] = False
            prof["host_s"] += time.perf_counter() - t_host
            retriangulate()
            added_since_ba += len(accepted)
        else:
            prof["host_s"] += time.perf_counter() - t_host
        if added_since_ba >= cfg.ba_every:
            run_ba(cfg.ba_iterations, False)
            reject_outliers()
            retriangulate()
            added_since_ba = 0
        if verbose and accepted:
            print(f"added {len(accepted)} views (group {P}): "
                  f"{int(track_ok.sum())} tracks, "
                  f"{int(pose_mask.sum())}/{V} cams")

    # --- final polish -----------------------------------------------------
    run_ba(cfg.final_ba_iterations, cfg.refine_intrinsics)
    reject_outliers()
    retriangulate()
    run_ba(cfg.ba_iterations, cfg.refine_intrinsics)
    retriangulate()

    # --- GPS anchoring (parity: GPS motion prior, use-GPS option) ---------
    if center_priors is not None:
        from regard3d_tpu.core import metrics as metrics_mod
        pri = np.asarray(center_priors, np.float64)
        pm = pose_mask & np.isfinite(pri).all(axis=1)
        if pm.sum() >= 3:
            sim = metrics_mod.umeyama(np.asarray(C)[pm], pri[pm])
            # x_cam = R_v (X - C_v); world transform X' = s R X + t:
            # R'_v = R_v R^T, C'_v = s R C_v + t, X' likewise
            Rn = np.einsum("vij,kj->vik", np.asarray(R), sim.R)
            Cn = sim.apply(np.asarray(C))
            Xn = sim.apply(np.asarray(X))
            R = jnp.asarray(Rn, dtype)
            C = jnp.asarray(Cn, dtype)
            X = jnp.asarray(Xn, dtype)
            prior_arr = jnp.asarray(np.where(pm[:, None], pri, Cn), dtype)
            w = (obs_active & track_ok[np.asarray(tid)]
                 & pose_mask[np.asarray(vid)])
            obs_ba = lm.BAObservations(
                view_id=vid, intr_id=iid[vid], point_id=tid,
                model=inputs.models[iid[vid]], xy=inputs.xy,
                weight=jnp.asarray(w, dtype))
            state = lm.BAState(R=R, C=C, intr=intr, X=X)
            opts = lm.BAOptions(max_iterations=cfg.ba_iterations,
                                refine_intrinsics=cfg.refine_intrinsics,
                                huber_delta_px=cfg.huber_delta_px,
                                center_prior_weight=prior_weight)
            out, _ = lm.bundle_adjust(
                state, obs_ba, opts,
                fixed_pose_mask=jnp.asarray(~pose_mask),
                center_prior=prior_arr)
            R, C, intr, X = out.R, out.C, out.intr, out.X
            retriangulate()

    r2 = np.asarray(residuals_px(R, C, X, intr))
    live = (obs_active & track_ok[tid_np] & pose_mask[vid_np])
    rms = float(np.sqrt(r2[live].mean())) if live.any() else float("nan")
    resid = np.sqrt(r2[live]) if live.any() else np.zeros(1)
    stats = {
        "num_cameras": int(pose_mask.sum()),
        "num_tracks": int(track_ok.sum()),
        "num_observations": int(live.sum()),
        "rms_px": rms,
        "residual_min": float(resid.min()),
        "residual_max": float(resid.max()),
        "residual_mean": float(resid.mean()),
        "residual_median": float(np.median(resid)),
        "order_added": order_added,
        "profile": {k: (round(v, 2) if isinstance(v, float) else v)
                    for k, v in prof.items()},
    }
    if pod_size:
        stats["stellar_pod_size"] = pod_size
    stats["init_hub"] = int(i0)
    if pod_size == 0:
        stats["init_pair"] = (int(i0), int(j0))
    return SfMResult(R, C, pose_mask, X, track_ok, obs_active, intr, stats)
