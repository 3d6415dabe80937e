"""Global SfM — rotation & translation averaging.

Equivalent of OpenMVG's ``GlobalSfMReconstructionEngine_RelativeMotions``
driven by the reference (``src/threads/R3DTriangulationThread.cpp:227-248``)
with its GUI menus: rotation averaging L1 | L2 and translation averaging
L1 | L2-chordal | SoftL1 (``src/R3DProject.h:258-266``).

TPU formulation — both averaging problems become dense spectral problems
(batched einsum + eigh on the MXU), with IRLS reweighting for the robust
(L1/SoftL1) variants:

* rotations: the block matrix G with G[i,j] = w_ij * R_ij^T has the stacked
  global rotations as its dominant 3-eigenspace (Arie-Nachimson/Martinec
  spectral relaxation); each 3x3 block of the eigenvector matrix is
  projected back to SO(3) by Procrustes, and IRLS reweights pairs by their
  chordal residual for L1.
* translations: every pair constrains C_j - C_i to the line spanned by its
  relative direction d_ij: ||[d_ij]_x (C_j - C_i)||^2.  The constraint
  matrix's null-space (smallest eigenvectors of A^T A with the centroid
  gauge removed) yields all centers at once, IRLS for L1/SoftL1; the global
  sign is fixed by majority cheirality.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.ba import lm
from regard3d_tpu.core import cameras
from regard3d_tpu.kernels import geometry, ransac
from regard3d_tpu.sfm import incremental as inc
from regard3d_tpu.sfm import tracks as tracks_mod
from regard3d_tpu.sfm.triangulate import (reprojection_residuals_px,
                                          triangulate_tracks)


@dataclasses.dataclass(frozen=True)
class GlobalConfig:
    rotation_loss: str = "l2"          # "l1" | "l2"
    translation_loss: str = "softl1"   # "l1" | "l2_chordal" | "softl1"
    irls_iterations: int = 8
    min_pair_inliers: int = 30
    max_err_px: float = 4.0
    ransac_iters: int = 1024
    ba_iterations: int = 40
    refine_intrinsics: bool = True
    huber_delta_px: float = 2.0
    min_angle_deg: float = 2.0


class RelativeMotion(NamedTuple):
    i: int
    j: int
    R_ij: np.ndarray      # (3,3): R_j = R_ij @ R_i
    dir_i: np.ndarray     # (3,): direction of (C_j - C_i) in camera-i frame
    num_inliers: int
    obs_i: np.ndarray     # observation rows in view i (inliers)
    obs_j: np.ndarray


def average_rotations(motions: List[RelativeMotion], V: int,
                      loss: str = "l2", irls_iterations: int = 8
                      ) -> np.ndarray:
    """Spectral rotation averaging (+IRLS for l1). Returns (V, 3, 3) with
    R[anchor] aligned so rotations are gauge-fixed to camera 0 = identity."""
    idx_i = np.asarray([m.i for m in motions])
    idx_j = np.asarray([m.j for m in motions])
    Rij = jnp.asarray(np.stack([m.R_ij for m in motions]))      # (P, 3, 3)
    w = jnp.asarray([float(m.num_inliers) for m in motions])
    w = w / jnp.max(w)

    def solve(weights):
        G = jnp.zeros((V, V, 3, 3), Rij.dtype)
        # R_j = R_ij R_i  =>  blocks G[j,i] += w R_ij ; G[i,j] += w R_ij^T
        G = G.at[idx_j, idx_i].add(weights[:, None, None] * Rij)
        G = G.at[idx_i, idx_j].add(
            weights[:, None, None] * jnp.swapaxes(Rij, -1, -2))
        deg = jnp.zeros((V,), Rij.dtype).at[idx_i].add(weights) \
                                        .at[idx_j].add(weights)
        G = G + jnp.eye(V)[:, :, None, None] * \
            (deg[:, None, None, None] * jnp.eye(3)[None, None])
        Gm = G.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)
        evals, evecs = jnp.linalg.eigh(Gm)
        M = evecs[:, -3:].reshape(V, 3, 3)                      # top 3-space
        # blocks are R_i @ (c Q) for a shared mixing Q with det = +-1; when
        # det(Q) < 0 the per-block SO(3) projection is non-unique (equal
        # singular values) and flips blocks inconsistently — fix the global
        # orientation first by flipping one eigenvector column
        s = jnp.sign(jnp.sum(jnp.sign(jnp.linalg.det(M))))
        M = M.at[:, :, 2].multiply(jnp.where(s < 0, -1.0, 1.0))
        R = cameras.project_so3(M)
        return R

    def residual_weights(R, base_w):
        # chordal residual per pair
        Rj_pred = jnp.einsum("pij,pjk->pik", Rij, R[idx_i])
        res = jnp.linalg.norm((Rj_pred - R[idx_j]).reshape(len(motions), 9),
                              axis=-1)
        return base_w / jnp.maximum(res, 1e-2)

    R = solve(w)
    if loss == "l1":
        for _ in range(irls_iterations):
            R = solve(residual_weights(R, w))
    # gauge: R0 -> identity
    R = jnp.einsum("vij,kj->vik", R, R[0])
    # sign: ensure proper rotations survived projection (they do), align dets
    return np.asarray(R)


def _edge_depths(xh: np.ndarray, xv: np.ndarray, R_ij: np.ndarray,
                 Cj: np.ndarray):
    """Two-ray closest-point depths of an edge's inlier tracks in BOTH
    cameras, for a unit baseline. xh/xv: (N, 2) normalized coords in cam
    i / cam j; R_ij, Cj: pose of j in i's frame. Returns (z_i, z_j)."""
    dh = np.concatenate([xh, np.ones((len(xh), 1))], 1)
    dh /= np.linalg.norm(dh, axis=1, keepdims=True)
    dv = np.concatenate([xv, np.ones((len(xv), 1))], 1) @ R_ij  # R^T d
    dv /= np.linalg.norm(dv, axis=1, keepdims=True)
    b = np.sum(dh * dv, 1)
    d = dh @ Cj
    e = dv @ Cj
    den = np.maximum(1.0 - b * b, 1e-9)
    t = (d - b * e) / den
    X = t[:, None] * dh
    z_i = X[:, 2]
    z_j = (X - Cj) @ R_ij[2]
    return z_i, z_j


def reconcile_edge_scales(motions: List[RelativeMotion],
                          inputs: "inc.SfMInputs") -> Optional[np.ndarray]:
    """Per-edge baseline scales from shared-track depth ratios.

    A unit-baseline triangulation of edge m gives track depths lambda_m =
    d_true / s_m, so two edges observing the same track from the same view
    constrain log s_a - log s_b = log lambda_b - log lambda_a.  A log-LS
    over the edge graph (same reconciliation the stellar initializer uses
    per hub, here over the whole motion graph) recovers all baselines up to
    ONE global scale — which makes translation averaging well-posed even
    for collinear centers, where direction-only constraints leave per-edge
    spacings free (OpenMVG's SoftL1 engine reaches the same effect through
    its trifocal relative-scale stage). Returns (M,) scales with geometric
    mean 1, or None when the edge graph does not connect through shared
    tracks."""
    M = len(motions)
    if M < 2:
        return None
    track_id = np.asarray(inputs.track_id)
    xn = np.asarray(inc._normalized_xy(inputs, inputs.intr))
    seen: Dict[Tuple[int, int], list] = {}
    for mi, m in enumerate(motions):
        z_i, z_j = _edge_depths(xn[m.obs_i], xn[m.obs_j], m.R_ij, m.dir_i)
        tids = track_id[m.obs_i]
        ok = (z_i > 1e-6) & (z_j > 1e-6)
        for t, zi, zj, o in zip(tids, z_i, z_j, ok):
            if not o:
                continue
            seen.setdefault((m.i, int(t)), []).append((mi, np.log(zi)))
            seen.setdefault((m.j, int(t)), []).append((mi, np.log(zj)))

    # aggregate pairwise log-ratio observations per motion pair
    pair_diffs: Dict[Tuple[int, int], list] = {}
    for entries in seen.values():
        if len(entries) < 2:
            continue
        base = entries[0]
        for other in entries[1:]:
            a, la = base
            b2, lb = other
            if a == b2:
                continue
            kk = (min(a, b2), max(a, b2))
            diff = (lb - la) if a < b2 else (la - lb)
            pair_diffs.setdefault(kk, []).append(diff)

    if not pair_diffs:
        return None
    # connectivity over motions
    parent = list(range(M))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b2) in pair_diffs:
        parent[find(a)] = find(b2)
    if len({find(x) for x in range(M)}) > 1:
        return None

    # log-LS: minimize sum w (x_a - x_b - r_ab)^2, gauge mean(x)=0
    L = np.zeros((M, M))
    rhs = np.zeros(M)
    for (a, b2), diffs in pair_diffs.items():
        # x_a - x_b should equal r = median(log lambda_b - log lambda_a)
        r = float(np.median(diffs))
        w = float(min(len(diffs), 20))
        L[a, a] += w
        L[b2, b2] += w
        L[a, b2] -= w
        L[b2, a] -= w
        rhs[a] += w * r
        rhs[b2] -= w * r
    L += np.ones((M, M)) / M          # centroid gauge
    x = np.linalg.solve(L, rhs)
    x -= x.mean()
    return np.exp(x)


def _solve_centers_scaled(idx_i, idx_j, targets, weights, V):
    """Linear LS for centers: min sum w ||(C_j - C_i) - t_m||^2 with a
    centroid-zero gauge (graph Laplacian, one (V, V) solve for 3 rhs)."""
    L = np.zeros((V, V))
    rhs = np.zeros((V, 3))
    np.add.at(L, (idx_i, idx_i), weights)
    np.add.at(L, (idx_j, idx_j), weights)
    np.add.at(L, (idx_i, idx_j), -weights)
    np.add.at(L, (idx_j, idx_i), -weights)
    np.add.at(rhs, idx_j, weights[:, None] * targets)
    np.add.at(rhs, idx_i, -weights[:, None] * targets)
    L = L + np.ones((V, V)) / V
    return np.linalg.solve(L, rhs)


def average_translations(motions: List[RelativeMotion], R_global: np.ndarray,
                         V: int, loss: str = "softl1",
                         irls_iterations: int = 8,
                         inputs: Optional["inc.SfMInputs"] = None
                         ) -> np.ndarray:
    """Solve for camera centers from pairwise direction constraints.
    Returns (V, 3) centers, gauge: centroid 0, scale ||C||_rms = 1, sign by
    majority cheirality.

    When ``inputs`` is given and the motion graph connects through shared
    tracks, per-edge baseline scales are reconciled first and the centers
    come from the well-posed scaled linear system (collinear-safe); the
    direction-only spectral solver remains the fallback."""
    if inputs is not None:
        scales = reconcile_edge_scales(motions, inputs)
        if scales is not None:
            idx_i = np.asarray([m.i for m in motions])
            idx_j = np.asarray([m.j for m in motions])
            dirs = np.stack([m.dir_i for m in motions])
            d_w = np.einsum("pji,pj->pi", R_global[idx_i], dirs)
            d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
            targets = scales[:, None] * d_w
            base_w = np.asarray([float(m.num_inliers) for m in motions])
            base_w = np.sqrt(base_w / base_w.max())
            w = base_w.copy()
            C = _solve_centers_scaled(idx_i, idx_j, targets, w, V)
            if loss in ("l1", "softl1"):
                for _ in range(irls_iterations):
                    res = np.linalg.norm(
                        (C[idx_j] - C[idx_i]) - targets, axis=-1)
                    s = max(float(np.median(scales)) * 0.05, 1e-9)
                    if loss == "softl1":
                        w = base_w / np.sqrt(np.sqrt(1.0 + (res / s) ** 2))
                    else:
                        w = base_w / np.maximum(res, 1e-3 * s)
                    C = _solve_centers_scaled(idx_i, idx_j, targets, w, V)
            C = C - C.mean(0)
            C = C / max(np.linalg.norm(C, axis=-1).mean(), 1e-12)
            return C.astype(np.asarray(R_global).dtype)
    return _average_translations_spectral(motions, R_global, V, loss,
                                          irls_iterations)


def _average_translations_spectral(motions: List[RelativeMotion],
                                   R_global: np.ndarray,
                                   V: int, loss: str = "softl1",
                                   irls_iterations: int = 8) -> np.ndarray:
    """Direction-only spectral solver (nullspace of the stacked
    cross-product constraints). Degenerate for collinear centers — used
    only when scale reconciliation is unavailable."""
    idx_i = np.asarray([m.i for m in motions])
    idx_j = np.asarray([m.j for m in motions])
    # world-frame direction of (C_j - C_i): d_w = R_i^T d_i
    dirs = np.stack([m.dir_i for m in motions])
    d_w = np.einsum("pji,pj->pi", R_global[idx_i], dirs)
    d_w = jnp.asarray(d_w / np.linalg.norm(d_w, axis=-1, keepdims=True))
    P = len(motions)
    base_w = jnp.asarray([float(m.num_inliers) for m in motions])
    base_w = jnp.sqrt(base_w / jnp.max(base_w))

    cross = cameras.hat(d_w)                                    # (P, 3, 3)

    def solve(weights):
        # rows: w * [d]_x (C_j - C_i) = 0  -> build normal matrix directly
        Wc = cross * weights[:, None, None]
        # A^T A = sum over pairs of block structure
        CC = jnp.einsum("pki,pkj->pij", Wc, Wc)                  # (P, 3, 3)
        AtA = jnp.zeros((V, V, 3, 3), d_w.dtype)
        AtA = AtA.at[idx_i, idx_i].add(CC)
        AtA = AtA.at[idx_j, idx_j].add(CC)
        AtA = AtA.at[idx_i, idx_j].add(-CC)
        AtA = AtA.at[idx_j, idx_i].add(-CC)
        M = AtA.transpose(0, 2, 1, 3).reshape(3 * V, 3 * V)
        # remove the translation gauge (3-dim nullspace: constant shifts):
        # project onto centroid-zero subspace by adding penalty on the mean
        ones = jnp.tile(jnp.eye(3), (V, 1)) / V                  # (3V, 3)
        M = M + (ones @ ones.T) * jnp.trace(M) / V
        evals, evecs = jnp.linalg.eigh(M)
        C = evecs[:, 0].reshape(V, 3)
        return C

    def residual_weights(C, base_w):
        diff = C[idx_j] - C[idx_i]
        res = jnp.linalg.norm(jnp.einsum("pij,pj->pi", cross, diff), axis=-1)
        scale = jnp.linalg.norm(diff, axis=-1).mean()
        if loss == "softl1":
            return base_w / jnp.sqrt(jnp.sqrt(1.0 + (res / (0.01 * scale +
                                                            1e-12)) ** 2))
        return base_w / jnp.maximum(res, 1e-3 * scale)

    C = solve(base_w)
    if loss in ("l1", "softl1"):
        for _ in range(irls_iterations):
            C = solve(residual_weights(C, base_w))

    # fix sign: majority of pairs should have dot(C_j - C_i, d_w) > 0
    diff = C[idx_j] - C[idx_i]
    s = jnp.sum(jnp.sign(jnp.sum(diff * d_w, -1)))
    C = C * jnp.where(s < 0, -1.0, 1.0)
    C = C - C.mean(0)
    C = C / jnp.maximum(jnp.linalg.norm(C, axis=-1).mean(), 1e-12)
    return np.asarray(C)


def compute_relative_motions(inputs: inc.SfMInputs,
                             table: tracks_mod.TrackTable,
                             cfg: GlobalConfig, key,
                             num_views: int,
                             block: int = 16,
                             attempts: int = 3) -> List[RelativeMotion]:
    """Robust E per co-visible pair -> relative rotation + direction.

    Pairs come from the sparse co-visibility table (no (V, V) matrix).
    Pairs are estimated in fixed-shape padded BLOCKS — one vmapped
    ACRANSAC-E dispatch plus one batched cheirality-voting decomposition
    per block (the serial per-pair loop costs a device round-trip per
    pair, which dominates at city scale on the TPU tunnel).  A pair whose
    best E decomposes with <70% cheirality-consistent inliers (a twisted
    pose that would inject an outlier edge into the averaging problems)
    is retried with fresh randomness up to ``attempts`` times, then
    dropped — the same acceptance gate as ``incremental._relative_pose``."""
    pairs, _ = tracks_mod.covisibility_pairs(table, num_views,
                                             min_count=cfg.min_pair_inliers)
    xn = np.asarray(inc._normalized_xy(inputs, inputs.intr))
    pcfg = _cfg_for_pairs(cfg)
    items = []
    for i, j in ((int(a), int(b)) for a, b in pairs):
        oi, oj = inc._pair_obs(inputs, i, j)
        if len(oi) >= 16:
            items.append((i, j, oi, oj))
    if not items:
        return []
    cap = max(64, 1 << int(np.ceil(np.log2(
        max(len(g[2]) for g in items)))))
    intr_np = np.asarray(inputs.intr)
    iid_np = np.asarray(inputs.intr_id)
    sizes = np.asarray(inputs.image_sizes)

    motions = []
    pending = items
    for attempt in range(attempts):
        retry = []
        for s0 in range(0, len(pending), block):
            grp = pending[s0:s0 + block]
            P = len(grp)
            x1 = np.zeros((block, cap, 2), np.float32)
            x2 = np.zeros((block, cap, 2), np.float32)
            mask = np.zeros((block, cap), bool)
            la_e = np.zeros((block,), np.float32)
            me_e = np.full((block,), 1.0, np.float32)
            for bi, (i, j, oi, oj) in enumerate(grp):
                n = len(oi)
                f = float(intr_np[iid_np[i], 0])
                x1[bi, :n] = xn[oi]
                x2[bi, :n] = xn[oj]
                mask[bi, :n] = True
                w = float(sizes[i][0]) or 2.0 * f
                h = float(sizes[i][1]) or 2.0 * f
                la_e[bi] = np.log10(2.0 * np.hypot(w, h) / (w * h) * f)
                me_e[bi] = (cfg.max_err_px / f) ** 2
            # per-pair keys from the pair identity + attempt: results are
            # independent of block composition
            base = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                key, jnp.asarray([g[0] for g in grp]
                                 + [0] * (block - P), dtype=jnp.uint32))
            base = jax.vmap(jax.random.fold_in)(
                base, jnp.asarray([g[1] for g in grp]
                                  + [0] * (block - P), dtype=jnp.uint32))
            keys = jax.vmap(lambda k: jax.random.fold_in(k, attempt))(base)
            maskj = jnp.asarray(mask)
            re = ransac.acransac_e_batch(
                keys, jnp.asarray(x1), jnp.asarray(x2), maskj,
                jnp.asarray(la_e), jnp.asarray(me_e),
                iters=pcfg.ransac_iters)
            inl_dev = re.inliers & maskj
            Rb, tb, nval = geometry.decompose_essential(
                re.model, jnp.asarray(x1), jnp.asarray(x2), mask=inl_dev)
            e_valid = np.asarray(re.valid)
            e_num = np.asarray(re.num_inliers)
            inl_np = np.asarray(inl_dev)
            Rb_np = np.asarray(Rb)
            tb_np = np.asarray(tb)
            frac = np.asarray(nval) / np.maximum(e_num, 1)
            for bi, (i, j, oi, oj) in enumerate(grp):
                if not e_valid[bi] or e_num[bi] < cfg.min_pair_inliers:
                    continue
                if frac[bi] < 0.7:
                    retry.append((i, j, oi, oj))
                    continue
                R_ij = Rb_np[bi]
                trel = tb_np[bi]
                inl = inl_np[bi][:len(oi)]
                if int(inl.sum()) < cfg.min_pair_inliers:
                    continue
                # C_j in cam-i frame: -R^T t; direction of C_j - C_i
                Cj_i = -R_ij.T @ trel
                nrm = np.linalg.norm(Cj_i)
                if nrm < 1e-9:
                    continue
                motions.append(RelativeMotion(i, j, R_ij, Cj_i / nrm,
                                              int(inl.sum()),
                                              oi[inl], oj[inl]))
        if not retry:
            break
        pending = retry
    return motions


def _cfg_for_pairs(cfg: GlobalConfig) -> inc.IncrementalConfig:
    return inc.IncrementalConfig(max_err_px=cfg.max_err_px,
                                 ransac_iters=cfg.ransac_iters)


def run_global(inputs: inc.SfMInputs,
               cfg: GlobalConfig = GlobalConfig(),
               seed: int = 0) -> inc.SfMResult:
    """Full global pipeline: relative motions -> rotation averaging ->
    translation averaging -> triangulation -> BA."""
    key = jax.random.PRNGKey(seed)
    V = inputs.intr_id.shape[0]
    T = inputs.num_tracks
    O = inputs.xy.shape[0]
    dtype = inputs.xy.dtype

    table = tracks_mod.TrackTable(np.asarray(inputs.track_id),
                                  np.asarray(inputs.view_id),
                                  np.asarray(inputs.feature_id), T)

    motions = compute_relative_motions(inputs, table, cfg, key, V)
    if not motions:
        raise ValueError("no relative motions could be estimated")
    connected = sorted({m.i for m in motions} | {m.j for m in motions})
    if len(connected) < V:
        # keep going with the connected subset; others stay unposed
        pass

    R_glob = average_rotations(motions, V, cfg.rotation_loss,
                               cfg.irls_iterations)
    C_glob = average_translations(motions, R_glob, V, cfg.translation_loss,
                                  cfg.irls_iterations, inputs=inputs)

    # scale heuristic: translation averaging returns unit-rms centers; the
    # absolute scale is a free gauge (as in any SfM); keep as-is.
    R = jnp.asarray(R_glob, dtype)
    C = jnp.asarray(C_glob, dtype)
    pose_mask = np.zeros(V, bool)
    pose_mask[connected] = True

    obs_active = np.ones(O, bool)
    intr = jnp.asarray(inputs.intr, dtype)
    tid = jnp.asarray(inputs.track_id)
    vid = jnp.asarray(inputs.view_id)
    iid = jnp.asarray(inputs.intr_id)
    mean_focal = float(np.mean(np.asarray(inputs.intr)[:, 0]))

    @jax.jit
    def triangulate_all(R, C, pmask, oactive, intr):
        b = inc._bearings(inputs, intr)
        return triangulate_tracks(R, C, pmask, tid, vid, oactive, b, T,
                                  cfg.min_angle_deg, cfg.max_err_px,
                                  mean_focal)

    @jax.jit
    def residuals_px(R, C, X, intr):
        return reprojection_residuals_px(R, C, intr, inputs.models, iid[vid],
                                         vid, tid, X, inputs.xy)

    tri = triangulate_all(R, C, jnp.asarray(pose_mask),
                          jnp.asarray(obs_active), intr)
    X = tri.X
    track_ok = np.asarray(tri.ok)

    def run_ba(iterations, refine):
        nonlocal R, C, X, intr
        w = (obs_active & track_ok[np.asarray(tid)]
             & pose_mask[np.asarray(vid)])
        obs_ba = lm.BAObservations(
            view_id=vid, intr_id=iid[vid], point_id=tid,
            model=inputs.models[iid[vid]], xy=inputs.xy,
            weight=jnp.asarray(w, dtype))
        anchor = connected[0]
        fixed = jnp.asarray(~pose_mask | (np.arange(V) == anchor))
        state = lm.BAState(R=R, C=C, intr=intr, X=X)
        opts = lm.BAOptions(max_iterations=iterations,
                            refine_intrinsics=refine,
                            huber_delta_px=cfg.huber_delta_px)
        out, stats = lm.bundle_adjust(state, obs_ba, opts,
                                      fixed_pose_mask=fixed)
        R, C, intr, X = out.R, out.C, out.intr, out.X
        return stats

    # BA rounds with outlier re-testing between them. Rejection is NOT
    # permanent: each round re-admits observations that fit again — the
    # averaging initialization can start far enough from the optimum that a
    # hard first-round rejection starves end-of-graph cameras of support.
    run_ba(cfg.ba_iterations, False)
    for round_i in range(3):
        r2 = np.asarray(residuals_px(R, C, X, intr))
        thr = cfg.max_err_px * (2.0 if round_i == 0 else 1.0)
        obs_active = pose_mask[np.asarray(vid)] & (r2 <= thr ** 2)
        tri = triangulate_all(R, C, jnp.asarray(pose_mask),
                              jnp.asarray(obs_active), intr)
        X = tri.X
        track_ok = np.asarray(tri.ok)
        run_ba(cfg.ba_iterations, cfg.refine_intrinsics)

    r2 = np.asarray(residuals_px(R, C, X, intr))
    tid_np = np.asarray(tid)
    vid_np = np.asarray(vid)
    live = (obs_active & track_ok[tid_np] & pose_mask[vid_np])
    resid = np.sqrt(r2[live]) if live.any() else np.zeros(1)
    stats = {
        "num_cameras": int(pose_mask.sum()),
        "num_tracks": int(track_ok.sum()),
        "num_observations": int(live.sum()),
        "rms_px": float(np.sqrt(r2[live].mean())) if live.any() else np.nan,
        "residual_min": float(resid.min()),
        "residual_max": float(resid.max()),
        "residual_mean": float(resid.mean()),
        "residual_median": float(np.median(resid)),
        "num_relative_motions": len(motions),
    }
    return inc.SfMResult(R, C, pose_mask, X, track_ok, obs_active, intr,
                         stats)
