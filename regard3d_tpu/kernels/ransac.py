"""Batched robust estimation — the ACRANSAC stage, TPU style.

Replaces OpenMVG's ``ImageCollectionGeometricFilter`` +
``GeometricFilter_{F,E,H}Matrix_AC`` robust loops
(``src/R3DComputeMatches.cpp:2086-2233``: 2048 iterations, 4.0 px upper
bound) with fixed-shape vectorized estimation:

* all RANSAC samples are drawn at once (top-k over uniforms -> distinct
  indices), all minimal problems solved as one batched eigen/SVD problem,
  all residuals evaluated as one (iters, N) tensor;
* model selection is truncated-MSAC score; the a-contrario part (the "AC")
  — adaptive inlier threshold by NFA minimization over the sorted residuals
  — is applied to the winning model, matching ACRANSAC's behaviour of
  returning a data-driven threshold <= the user bound instead of a fixed one;
* a masked least-squares refit on the detected inliers polishes the model.

Everything is jit/vmap-friendly: one call filters one pair; ``vmap`` over a
leading axis filters a block of pairs (P2 pair-block parallelism of
SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from regard3d_tpu.kernels import geometry

_BIG = 1e30


class RansacResult(NamedTuple):
    model: jnp.ndarray       # (3, 3)
    inliers: jnp.ndarray     # (N,) bool
    num_inliers: jnp.ndarray # () int32
    threshold_sq: jnp.ndarray  # () adaptive squared threshold
    log_nfa: jnp.ndarray     # () log10 NFA of the accepted model
    valid: jnp.ndarray       # () bool


def _draw_samples(key, mask, iters: int, s: int):
    """(iters, s) distinct indices of valid entries.

    Sequential-sampling construction (draw j from [0, nvalid-j) and shift
    past already-chosen slots): exact uniform distinct samples in O(s^2)
    tiny elementwise ops — replaces a top-k over (iters, N) uniforms that
    dominated the sampling cost on TPU. Arbitrary masks are handled by a
    single stable argsort that compacts valid indices to the front."""
    n = mask.shape[0]
    nvalid = jnp.sum(mask.astype(jnp.int32))
    order = jnp.argsort(~mask, stable=True)                  # valid first
    u = jax.random.uniform(key, (iters, s))
    cols = []                    # built functionally: no scatters (slow to
    for j in range(s):           # lower under vmap), only stack/compare
        hi = jnp.maximum(nvalid - j, 1)
        dj = jnp.minimum((u[:, j] * hi).astype(jnp.int32), hi - 1)
        if j > 0:
            prev = jnp.sort(jnp.stack(cols, -1), axis=-1)
            for k in range(j):
                dj = dj + (dj >= prev[:, k]).astype(jnp.int32)
        cols.append(dj)
    chosen = jnp.stack(cols, -1)
    return order[jnp.clip(chosen, 0, n - 1)]


def _log10_comb(n, k):
    """log10 C(n, k) elementwise (float inputs ok)."""
    lg = jax.lax.lgamma
    ln10 = jnp.log(10.0)
    return (lg(n + 1.0) - lg(k + 1.0) - lg(n - k + 1.0)) / ln10


def _nfa_threshold(resid_sq, mask, sample_size: int, logalpha0,
                   err_dim: float, max_err_sq: float):
    """A-contrario threshold on one model's residuals.

    resid_sq: (N,) squared residuals; returns (threshold_sq, log_nfa, k_star).
    NFA(k) = (N-s) C(N,k) C(k,s) (alpha0 * r_k^d)^(k-s)  (ORSA)."""
    n = resid_sq.shape[0]
    r = jnp.where(mask, resid_sq, _BIG)
    sorted_r = jnp.sort(r)                                   # ascending
    nvalid = jnp.sum(mask.astype(jnp.int32))
    ks = jnp.arange(1, n + 1, dtype=jnp.float32)             # k = rank
    nf = nvalid.astype(jnp.float32)
    log_c_n_k = _log10_comb(nf, ks)
    log_c_k_s = _log10_comb(ks, float(sample_size))
    # distance^d term: err_dim counts the codimension (1 for point-line)
    dist = jnp.sqrt(jnp.maximum(sorted_r, 1e-24))
    lognfa = (jnp.log10(jnp.maximum(nf - sample_size, 1.0))
              + log_c_n_k + log_c_k_s
              + (ks - sample_size) * (logalpha0
                                      + err_dim * jnp.log10(dist)))
    eligible = ((ks > sample_size) & (ks <= nf)
                & (sorted_r <= max_err_sq) & (sorted_r < _BIG / 2))
    lognfa = jnp.where(eligible, lognfa, jnp.inf)
    k_star = jnp.argmin(lognfa)
    best = lognfa[k_star]
    thr = sorted_r[k_star]
    ok = jnp.isfinite(best)
    return jnp.where(ok, thr, max_err_sq), jnp.where(ok, best, jnp.inf), k_star


def ransac(key, data, mask, fit_fn: Callable, resid_fn: Callable,
           sample_size: int, iters: int, max_err_sq: float,
           logalpha0: float, err_dim: float = 1.0,
           min_inliers: int = 0) -> RansacResult:
    """Generic vectorized AC-RANSAC.

    data: pytree of (N, ...) arrays; fit_fn(sampled_pytree (S, s, ...)) ->
    (S, 3, 3) models; resid_fn(models, data) -> (S, N) squared residuals.

    The hypothesis sweep is CHUNKED with ``lax.scan`` (128 draws per
    step): the live (chunk*models, N) residual tensor stays bounded
    regardless of ``iters``, which caps both device memory and the host
    shadow the axon tunnel keeps for device intermediates.  Chunking is
    bit-exact vs the flat sweep: the same draws in the same order, ties
    resolved toward the earlier draw (argmin semantics)."""
    n = mask.shape[0]
    chunk = min(iters, 128)
    n_chunks = -(-iters // chunk)
    iters_eff = n_chunks * chunk                   # == iters for pow-2 iters
    idx = _draw_samples(key, mask, iters_eff, sample_size)   # (S, s)
    idx_c = idx.reshape(n_chunks, chunk, sample_size)

    def score_chunk(carry, idx_one):
        best_score, best_model = carry
        sampled = jax.tree_util.tree_map(lambda a: a[idx_one], data)
        models = fit_fn(sampled)                   # (chunk[*m], 3, 3)
        resid = resid_fn(models, data)             # (chunk[*m], N)
        resid = jnp.where(mask[None, :], resid, _BIG)
        score = jnp.sum(jnp.minimum(resid, max_err_sq), axis=1)
        b = jnp.argmin(score)
        better = score[b] < best_score             # strict: ties keep earlier
        return (jnp.where(better, score[b], best_score),
                jnp.where(better, models[b], best_model)), None

    leaf = jax.tree_util.tree_leaves(data)[0]   # models follow data dtype
    init = (jnp.asarray(_BIG * n, leaf.dtype),
            jnp.zeros((3, 3), leaf.dtype))
    (best_score, model), _ = jax.lax.scan(score_chunk, init, idx_c)
    r_best = jnp.where(mask, resid_fn(model[None], data)[0], _BIG)

    thr_sq, log_nfa, _ = _nfa_threshold(r_best, mask, sample_size,
                                        logalpha0, err_dim, max_err_sq)
    inliers = mask & (r_best <= thr_sq)

    # masked least-squares refit on inliers, then re-derive inliers
    refit = fit_fn(jax.tree_util.tree_map(lambda a: a[None], data),
                   weights=inliers[None].astype(jnp.float32))
    model2 = refit[0]
    r2 = jnp.where(mask, resid_fn(model2[None], data)[0], _BIG)
    thr2, nfa2, _ = _nfa_threshold(r2, mask, sample_size, logalpha0,
                                   err_dim, max_err_sq)
    better = nfa2 <= log_nfa
    model = jnp.where(better, model2, model)
    inliers = jnp.where(better, mask & (r2 <= thr2), inliers)
    thr_sq = jnp.where(better, thr2, thr_sq)
    log_nfa = jnp.minimum(nfa2, log_nfa)

    num = jnp.sum(inliers.astype(jnp.int32))
    valid = (log_nfa < 0.0) & (num >= max(min_inliers, sample_size + 1))
    return RansacResult(model, inliers, num, thr_sq, log_nfa, valid)


# ---------------------------------------------------------------------------
# Concrete filters (F / E / H / resection)
# ---------------------------------------------------------------------------

def _logalpha0_line(w: float, h: float) -> float:
    """alpha0 for point-to-line errors: P(dist<r) ~ 2r * diag / area."""
    area = w * h
    diag = math.sqrt(w * w + h * h)
    return math.log10(2.0 * diag / area)


def _logalpha0_point(w: float, h: float) -> float:
    """alpha0 for point-to-point errors: P(dist<r) ~ pi r^2 / area."""
    return math.log10(math.pi / (w * h))


def _logalpha0_e(w, h, focal_px):
    """alpha0 for the E filter: residuals are point-to-line distances in
    *normalized* coords, so the pixel-domain alpha0 (2·diag/area) picks up a
    +log10(f) unit change (dist_px = f·dist_norm). This matches OpenMVG's
    essential ACRANSAC, which scores epipolar distances in pixels with the
    image-geometry alpha0 (vs. the previous ad-hoc log10(2.0))."""
    import numpy as np
    area = w * h
    diag = np.sqrt(w * w + h * h)
    return jnp.log10(2.0 * diag / area * focal_px)


# --- single-pair cores: logalpha0 / max_err_sq are *traced* scalars so one
# compiled program covers every image size and focal (no per-size recompile)

def _f_one(key, x1, x2, mask, logalpha0, max_err_sq, iters: int):
    return ransac(
        key, {"x1": x1, "x2": x2}, mask,
        fit_fn=lambda d, weights=None: geometry.fit_fundamental_8pt(
            d["x1"], d["x2"], weights),
        resid_fn=lambda M, d: geometry.epipolar_dist_f(
            M, d["x1"][None], d["x2"][None]),
        sample_size=8, iters=iters, max_err_sq=max_err_sq,
        logalpha0=logalpha0, err_dim=1.0)


def _e_one(key, x1n, x2n, mask, logalpha0, max_err_sq, iters: int):
    """Essential ACRANSAC with Nistér 5-point minimal samples (the solver
    OpenMVG's essential filter uses — SURVEY §2.3): each sample yields up
    to 10 E candidates, all scored; the a-contrario threshold, weighted
    8-point least-squares refit, and inlier extraction reuse the generic
    machinery. 5-point samples keep the all-inlier probability high at
    large outlier ratios and are immune to the 8-point planar degeneracy."""
    n = mask.shape[0]
    idx = _draw_samples(key, mask, iters, 5)

    # chunked sweep (64 draws -> <=640 E candidates a step, lax.scan):
    # the flat (iters*10, N) residual tensor at 2048 iters and a 2048-point
    # cap compiled to a 15GB einsum intermediate — HBM OOM; chunking keeps
    # the live set bounded and is bit-exact vs the flat argmin (same draw
    # order, strict < keeps the earliest minimum)
    chunk = min(iters, 64)
    n_chunks = -(-iters // chunk)
    idx_c = idx[:n_chunks * chunk].reshape(n_chunks, chunk, 5)

    def score_chunk(carry, idx_one):
        b_score, b_model, b_ok = carry
        models, okm_c = geometry.fit_essential_5pt(x1n[idx_one],
                                                   x2n[idx_one])
        models = models.reshape(-1, 3, 3)                 # (chunk*10, 3, 3)
        okm_c = okm_c.reshape(-1)
        resid = geometry.epipolar_dist_f(models, x1n[None], x2n[None])
        resid = jnp.where(mask[None, :] & okm_c[:, None], resid, _BIG)
        score = jnp.sum(jnp.minimum(resid, max_err_sq), axis=1)
        b = jnp.argmin(score)
        better = score[b] < b_score
        return (jnp.where(better, score[b], b_score),
                jnp.where(better, models[b], b_model),
                jnp.where(better, okm_c[b], b_ok)), None

    init = (jnp.asarray(_BIG * n, x1n.dtype),
            jnp.zeros((3, 3), x1n.dtype), jnp.zeros((), bool))
    (_, model, ok_best), _ = jax.lax.scan(score_chunk, init, idx_c)
    r_best = jnp.where(mask & ok_best,
                       geometry.epipolar_dist_f(model[None], x1n[None],
                                                x2n[None])[0], _BIG)

    thr_sq, log_nfa, _ = _nfa_threshold(r_best, mask, 5, logalpha0, 1.0,
                                        max_err_sq)
    inliers = mask & (r_best <= thr_sq)

    refit = geometry.fit_essential_8pt(
        x1n[None], x2n[None], inliers[None].astype(jnp.float32))
    model2 = refit[0]
    r2 = jnp.where(mask, geometry.epipolar_dist_f(
        model2[None], x1n[None], x2n[None])[0], _BIG)
    thr2, nfa2, _ = _nfa_threshold(r2, mask, 5, logalpha0, 1.0, max_err_sq)
    better = nfa2 <= log_nfa
    model = jnp.where(better, model2, model)
    inliers = jnp.where(better, mask & (r2 <= thr2), inliers)
    thr_sq = jnp.where(better, thr2, thr_sq)
    log_nfa = jnp.minimum(nfa2, log_nfa)

    num = jnp.sum(inliers.astype(jnp.int32))
    valid = (log_nfa < 0.0) & (num >= 6) & ok_best
    return RansacResult(model, inliers, num, thr_sq, log_nfa, valid)


def _e_one_8pt(key, x1n, x2n, mask, logalpha0, max_err_sq, iters: int):
    return ransac(
        key, {"x1": x1n, "x2": x2n}, mask,
        fit_fn=lambda d, weights=None: geometry.fit_essential_8pt(
            d["x1"], d["x2"], weights),
        resid_fn=lambda M, d: geometry.epipolar_dist_f(
            M, d["x1"][None], d["x2"][None]),
        sample_size=8, iters=iters, max_err_sq=max_err_sq,
        logalpha0=logalpha0, err_dim=1.0)


def _h_one(key, x1, x2, mask, logalpha0, max_err_sq, iters: int):
    return ransac(
        key, {"x1": x1, "x2": x2}, mask,
        fit_fn=lambda d, weights=None: geometry.fit_homography_4pt(
            d["x1"], d["x2"], weights),
        resid_fn=lambda M, d: geometry.sym_transfer_h(
            M, d["x1"][None], d["x2"][None]),
        sample_size=4, iters=iters, max_err_sq=max_err_sq,
        logalpha0=logalpha0, err_dim=2.0)


_f_one_jit = functools.partial(jax.jit, static_argnames=("iters",))(_f_one)
_e_one_jit = functools.partial(jax.jit, static_argnames=("iters",))(_e_one)
_h_one_jit = functools.partial(jax.jit, static_argnames=("iters",))(_h_one)


def acransac_f(key, x1, x2, mask, width: float, height: float,
               iters: int = 1024, max_err_px: float = 4.0) -> RansacResult:
    """Fundamental-matrix filter (parity: ACRANSAC F, 2048 iters, 4 px,
    src/R3DComputeMatches.cpp:2099-2110)."""
    return _f_one_jit(key, x1, x2, mask,
                      jnp.float32(_logalpha0_line(width, height)),
                      jnp.float32(max_err_px ** 2), iters=iters)


def acransac_e(key, x1n, x2n, mask, focal_px: float = 1.0,
               iters: int = 1024, max_err_px: float = 4.0,
               width: float = 0.0, height: float = 0.0) -> RansacResult:
    """Essential-matrix filter on normalized camera coords; the pixel
    threshold is divided by the focal (parity with OpenMVG's E filter).
    When width/height are given, alpha0 is derived from the image geometry
    (OpenMVG parity); otherwise the legacy log10(2.0) constant is used."""
    la = (_logalpha0_e(width, height, focal_px) if width and height
          else jnp.float32(math.log10(2.0)))
    return _e_one_jit(key, x1n, x2n, mask, la,
                      jnp.float32((max_err_px / focal_px) ** 2), iters=iters)


def acransac_h(key, x1, x2, mask, width: float, height: float,
               iters: int = 1024, max_err_px: float = 4.0) -> RansacResult:
    """Homography filter (symmetric transfer error, point-to-point alpha0)."""
    return _h_one_jit(key, x1, x2, mask,
                      jnp.float32(_logalpha0_point(width, height)),
                      jnp.float32(max_err_px ** 2), iters=iters)


# --- batched variants: one dispatch robust-filters a whole block of pairs
# (P2 pair-block parallelism; the vmapped axis shards over a device mesh)

def _make_batch(one_fn):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def batch(keys, x1, x2, mask, logalpha0, max_err_sq, iters=1024):
        f = lambda k, a, b, m, la, me: one_fn(k, a, b, m, la, me, iters)
        return jax.vmap(f)(keys, x1, x2, mask, logalpha0, max_err_sq)
    return batch


acransac_f_batch = _make_batch(_f_one)
acransac_e_batch = _make_batch(_e_one)
acransac_h_batch = _make_batch(_h_one)


class ResectionResult(NamedTuple):
    R: jnp.ndarray
    C: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    valid: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters", "focal_px",
                                             "max_err_px", "solver"))
def acransac_resection(key, X, xn, mask, focal_px: float = 1.0,
                       iters: int = 512,
                       max_err_px: float = 4.0,
                       solver: str = "p3p") -> ResectionResult:
    """Robust resection on normalized camera coords (the incremental
    engine's add-view step). ``solver="p3p"`` draws minimal 3-point
    samples and scores all (up to 4) Grunert poses per sample — the
    minimal solver OpenMVG's ACRANSAC resection uses, whose small sample
    keeps the inlier-sample probability high at large outlier ratios;
    ``solver="dlt"`` keeps the 6-point DLT hypotheses. Either way the
    winner gets the Gauss-Newton polish + consensus recount below."""
    max_err = (max_err_px / focal_px) ** 2
    return _resection_one(key, X, xn, mask, jnp.asarray(max_err, X.dtype),
                          iters, solver)


@functools.partial(jax.jit, static_argnames=("iters", "solver"))
def acransac_resection_batch(keys, X, xn, mask, max_err,
                             iters: int = 512,
                             solver: str = "p3p") -> ResectionResult:
    """Vmapped resection over a view group: the incremental engine's
    grouped add-view step (OpenMVG SequentialSfMReconstructionEngine2
    resects every adequate view of a round in one batch before the next
    BA). ``max_err``: per-item squared normalized-coordinate bound
    ((max_err_px/focal)^2) so views with different intrinsics batch
    together. Shapes: keys (P,2), X (P,N,3), xn (P,N,2), mask (P,N)."""
    f = lambda k, a, b, m, e: _resection_one(k, a, b, m, e, iters, solver)
    return jax.vmap(f)(keys, X, xn, mask, max_err)


def _resection_one(key, X, xn, mask, max_err, iters: int,
                   solver: str) -> ResectionResult:
    s = 3 if solver == "p3p" else 6
    idx = _draw_samples(key, mask, iters, s)

    # chunked sweep (lax.scan, 128 draws a step — bit-exact vs the flat
    # argmin, same bound rationale as _e_one: the flat (iters*models, N)
    # residual tensor vmapped over a resection group is the SfM stage's
    # biggest live set)
    chunk = min(iters, 128)
    n_chunks = -(-iters // chunk)
    idx_c = idx[:n_chunks * chunk].reshape(n_chunks, chunk, s)

    def score_chunk(carry, idx_one):
        b_score, b_R, b_C, b_ok = carry
        if solver == "p3p":
            Rp, Cp, okp = geometry.p3p_grunert(X[idx_one], xn[idx_one])
            Rc = Rp.reshape(-1, 3, 3)
            Cc = Cp.reshape(-1, 3)
            okc = okp.reshape(-1)
        else:
            Rc, Cc, okc = geometry.resection_dlt(X[idx_one], xn[idx_one])
        resid = geometry.reprojection_err_normalized(Rc, Cc, X[None],
                                                     xn[None])
        resid = jnp.where(mask[None, :] & okc[:, None], resid, _BIG)
        score = jnp.sum(jnp.minimum(resid, max_err), axis=1)
        b = jnp.argmin(score)
        better = score[b] < b_score
        return (jnp.where(better, score[b], b_score),
                jnp.where(better, Rc[b], b_R),
                jnp.where(better, Cc[b], b_C),
                jnp.where(better, okc[b], b_ok)), None

    n = mask.shape[0]
    init = (jnp.asarray(_BIG * n, X.dtype), jnp.zeros((3, 3), X.dtype),
            jnp.zeros((3,), X.dtype), jnp.zeros((), bool))
    (_, R_best, C_best, ok_best), _ = jax.lax.scan(score_chunk, init, idx_c)
    r_best = jnp.where(mask & ok_best, geometry.reprojection_err_normalized(
        R_best[None], C_best[None], X[None], xn[None])[0], _BIG)
    inliers = mask & (r_best <= max_err)

    # Gauss-Newton polish on the inlier set (DLT alone is noise-sensitive),
    # then recount inliers with the refined pose
    w = inliers.astype(X.dtype)
    Rb, Cb = geometry.refine_pose(R_best, C_best, X, xn, w, iters=10)
    r2 = geometry.reprojection_err_normalized(Rb[None], Cb[None], X[None],
                                              xn[None])[0]
    r2 = jnp.where(mask, r2, _BIG)
    inliers2 = mask & (r2 <= max_err)
    # second refinement round on the (possibly larger) consensus set
    Rb2, Cb2 = geometry.refine_pose(Rb, Cb, X, xn,
                                    inliers2.astype(X.dtype), iters=5)
    r3 = jnp.where(mask, geometry.reprojection_err_normalized(
        Rb2[None], Cb2[None], X[None], xn[None])[0], _BIG)
    inliers3 = mask & (r3 <= max_err)

    better = jnp.sum(inliers3) >= jnp.sum(inliers)
    Rf = jnp.where(better, Rb2, R_best)
    Cf = jnp.where(better, Cb2, C_best)
    inl = jnp.where(better, inliers3, inliers)
    num = jnp.sum(inl.astype(jnp.int32))
    valid = ok_best & (num >= 7)
    return ResectionResult(Rf, Cf, inl, num, valid)
