"""Multi-view geometry solvers as batched, statically-shaped JAX functions.

The linear-algebra core behind the reference's OpenMVG usage: fundamental /
essential / homography estimation feeding the ACRANSAC geometric filter
(``src/R3DComputeMatches.cpp:2086-2233``), relative-pose decomposition,
triangulation, and camera resection used inside the SfM engines
(``src/threads/R3DTriangulationThread.cpp``).

Solver choices (TPU rationale): minimal solvers with polynomial root finding
(7pt-F, 5pt-E Nister, P3P) vectorize poorly; we use slightly larger linear
samples — 8pt-F, 8pt-E (+ essential-manifold projection), 4pt-H, 6pt-DLT
resection — which are pure batched SVD/eigen problems the MXU/VPU handle in
bulk. RANSAC iteration counts are cheap on TPU, more samples compensate the
larger minimal set.

All solvers are written for a leading batch of samples: (S, n, 2) -> (S, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from regard3d_tpu.core import cameras


def to_h(x):
    """(..., 2) -> homogeneous (..., 3)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)


# ---------------------------------------------------------------------------
# Hartley normalization
# ---------------------------------------------------------------------------

def normalize_points(x, mask=None):
    """Similarity-normalize points to zero mean / sqrt(2) RMS.
    x: (..., N, 2), mask: (..., N) optional. Returns (xn, T) with
    xh_n = T @ xh."""
    if mask is None:
        mask = jnp.ones(x.shape[:-1], bool)
    w = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, -2), 1.0)
    mean = jnp.sum(x * w, -2, keepdims=True) / n[..., None, :]
    d = jnp.sqrt(jnp.sum(jnp.sum((x - mean) ** 2 * w, -1), -1) / n[..., 0])
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    xn = (x - mean) * s[..., None, None] * w
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, zeros, -s * mean[..., 0, 0]], -1),
        jnp.stack([zeros, s, -s * mean[..., 0, 1]], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    return xn, T


# ---------------------------------------------------------------------------
# Linear solvers (batched over samples)
# ---------------------------------------------------------------------------

def _smallest_singular_vector(A):
    """Right singular vector of the smallest singular value. A: (S, m, n)."""
    # eigh of A^T A is faster & more stable to batch than full svd of A
    AtA = jnp.einsum("smi,smj->sij", A, A)
    _, v = jnp.linalg.eigh(AtA)           # ascending eigenvalues
    return v[..., :, 0]


def fit_fundamental_8pt(x1, x2, w=None):
    """Normalized 8-point fundamental. x1, x2: (S, n>=8, 2) pixel coords;
    w: optional (S, n) row weights (masked least-squares refit).
    Returns F: (S, 3, 3) with x2^T F x1 = 0, rank-2 enforced."""
    m = None if w is None else w > 0
    x1n, T1 = normalize_points(x1, m)
    x2n, T2 = normalize_points(x2, m)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones],
                  -1)                      # (S, n, 9)
    if w is not None:
        A = A * w[..., None]
    f = _smallest_singular_vector(A)
    F = f.reshape(-1, 3, 3)
    # rank-2 projection
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = U @ (s[..., None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # scale-normalize
    nrm = jnp.linalg.norm(F.reshape(F.shape[0], 9), axis=-1, keepdims=True)
    return F / jnp.maximum(nrm, 1e-12)[..., None]


def fit_essential_8pt(x1, x2, w=None):
    """8-point essential on normalized camera coords (S, n, 2); projects to
    the essential manifold (singular values 1,1,0)."""
    F = fit_fundamental_8pt(x1, x2, w)
    U, s, Vt = jnp.linalg.svd(F)
    d = jnp.ones_like(s).at[..., 2].set(0.0)
    return U @ (d[..., None] * Vt)


def fit_homography_4pt(x1, x2, w=None):
    """DLT homography. x1, x2: (S, n>=4, 2). Returns H: (S, 3, 3),
    x2 ~ H x1."""
    m = None if w is None else w > 0
    x1n, T1 = normalize_points(x1, m)
    x2n, T2 = normalize_points(x2, m)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], -1)
    r2 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    A = jnp.concatenate([r1, r2], -2)      # (S, 2n, 9)
    if w is not None:
        A = A * jnp.concatenate([w, w], -1)[..., None]
    h = _smallest_singular_vector(A)
    H = h.reshape(-1, 3, 3)
    Hd = jnp.linalg.inv(T2) @ H @ T1
    return Hd / jnp.where(jnp.abs(Hd[..., 2:3, 2:3]) > 1e-12,
                          Hd[..., 2:3, 2:3], 1e-12)


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------

def sampson_f(F, x1, x2):
    """Sampson distance (squared, px^2). F: (..., 3, 3); x1/x2: (..., N, 2)."""
    x1h = to_h(x1)
    x2h = to_h(x2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1h)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2h)
    num = jnp.sum(x2h * Fx1, -1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def epipolar_dist_f(F, x1, x2):
    """Point-to-epipolar-line distance in image 2 (squared px^2) — the
    residual ACRANSAC uses for F."""
    x1h = to_h(x1)
    x2h = to_h(x2)
    l2 = jnp.einsum("...ij,...nj->...ni", F, x1h)
    num = jnp.sum(x2h * l2, -1) ** 2
    den = l2[..., 0] ** 2 + l2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def sym_transfer_h(H, x1, x2):
    """Symmetric transfer error for homography (squared)."""
    def fwd(H, a, b):
        ah = to_h(a)
        p = jnp.einsum("...ij,...nj->...ni", H, ah)
        p = p[..., :2] / jnp.where(jnp.abs(p[..., 2:]) > 1e-12, p[..., 2:], 1e-12)
        return jnp.sum((p - b) ** 2, -1)
    Hinv = jnp.linalg.inv(H)
    return 0.5 * (fwd(H, x1, x2) + fwd(Hinv, x2, x1))


# ---------------------------------------------------------------------------
# Essential decomposition & relative pose
# ---------------------------------------------------------------------------

def triangulate_2view(R1, C1, R2, C2, b1, b2):
    """Linear (midpoint-free, DLT-style) two-view triangulation from unit
    bearings in camera frames. R/C define x_cam = R(X - C).
    b1, b2: (..., N, 3). Returns X: (..., N, 3)."""
    # rays in world frame: d_i = R_i^T b_i, through C_i
    d1 = jnp.einsum("...ji,...nj->...ni", R1, b1)
    d2 = jnp.einsum("...ji,...nj->...ni", R2, b2)
    # solve min || (I - d d^T)(X - C) || for both rays: 3x3 system
    def nmat(d):
        eye = jnp.eye(3, dtype=d.dtype)
        return eye - d[..., :, None] * d[..., None, :]
    A1 = nmat(d1)
    A2 = nmat(d2)
    A = A1 + A2
    b = jnp.einsum("...nij,...j->...ni", A1, C1) + \
        jnp.einsum("...nij,...j->...ni", A2, C2)
    return jnp.linalg.solve(A + 1e-12 * jnp.eye(3, dtype=A.dtype),
                            b[..., None])[..., 0]


def decompose_essential(E, x1, x2):
    """Four-way decomposition of E with cheirality voting.

    E: (S, 3, 3); x1, x2: (S, N, 2) normalized camera coords (weights: all
    points vote). Returns (R (S,3,3), t (S,3), ngood (S,)) — pose of camera 2
    such that x_cam2 = R @ (X - C2) with C1 = 0, and t = -R C2 (unit norm)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(detU), jnp.ones_like(detU), detU], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(detV), jnp.ones_like(detV), detV], -1)[..., :, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]                                   # (S, 3)

    b1 = to_h(x1)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = to_h(x2)
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=E.dtype), Ra.shape)
    C0 = jnp.zeros_like(t)

    def count_good(R, tt):
        # camera2 center: C2 = -R^T t
        C2 = -jnp.einsum("...ji,...j->...i", R, tt)
        X = triangulate_2view(eye, C0, R, C2, b1, b2)
        z1 = X[..., 2]
        xc2 = jnp.einsum("...ij,...nj->...ni", R, X - C2[..., None, :])
        z2 = xc2[..., 2]
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(jnp.int32), -1)

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    counts = jnp.stack([count_good(R, tt) for R, tt in cands], -1)  # (S, 4)
    best = jnp.argmax(counts, -1)
    Rs = jnp.stack([c[0] for c in cands], -3)
    ts = jnp.stack([c[1] for c in cands], -2)
    S = E.shape[0]
    R = Rs[jnp.arange(S), best]
    tt = ts[jnp.arange(S), best]
    ngood = counts[jnp.arange(S), best]
    return R, tt, ngood


# ---------------------------------------------------------------------------
# Resection (6-point DLT + orthogonalization)
# ---------------------------------------------------------------------------

def resection_dlt(X, x):
    """Camera pose from 3D-2D correspondences in *normalized* camera coords.

    X: (S, n>=6, 3) world points; x: (S, n, 2) normalized (undistorted,
    K-free) image coords. Returns (R (S,3,3), C (S,3), ok (S,))."""
    u, v = x[..., 0], x[..., 1]
    z = jnp.zeros_like(u)
    o = jnp.ones_like(u)
    Xh = jnp.concatenate([X, o[..., None]], -1)       # (S, n, 4)
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -u[..., None] * Xh], -1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -v[..., None] * Xh], -1)
    A = jnp.concatenate([r1, r2], -2)                  # (S, 2n, 12)
    p = _smallest_singular_vector(A)
    P = p.reshape(-1, 3, 4)
    M = P[..., :3]
    # sign: points must be in front (positive depth for majority)
    depths = jnp.einsum("...j,...nj->...n", M[..., 2, :], X) + P[..., 2, 3][..., None]
    sign = jnp.where(jnp.sum(jnp.sign(depths), -1) >= 0, 1.0, -1.0)
    P = P * sign[..., None, None]
    M = P[..., :3]
    # scale so that rotation part has unit determinant-ish; orthogonalize
    scale = jnp.cbrt(jnp.maximum(jnp.abs(jnp.linalg.det(M)), 1e-20))
    M = M / scale[..., None, None]
    tvec = P[..., 3] / scale[..., None]
    R = cameras.project_so3(M)
    C = -jnp.einsum("...ji,...j->...i", R, tvec)
    ok = jnp.isfinite(R).all((-2, -1)) & jnp.isfinite(C).all(-1)
    return R, C, ok


def reprojection_err_normalized(R, C, X, x):
    """Squared residual in normalized coords for resection scoring.
    R: (S,3,3), C: (S,3), X: (S,N,3), x: (S,N,2)."""
    xc = jnp.einsum("...ij,...nj->...ni", R, X - C[..., None, :])
    z = xc[..., 2]
    proj = xc[..., :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)[..., None]
    err = jnp.sum((proj - x) ** 2, -1)
    return jnp.where(z > 0, err, 1e12)


# ---------------------------------------------------------------------------
# N-view triangulation (masked)
# ---------------------------------------------------------------------------

def triangulate_nview(R, C, b, mask):
    """Triangulate one point from up to V views. R: (V,3,3), C: (V,3),
    b: (V,3) unit bearings (world frame NOT required — camera frame),
    mask: (V,). Returns (X (3,), ok)."""
    d = jnp.einsum("vji,vj->vi", R, b)                 # rays in world frame
    w = mask.astype(R.dtype)
    eye = jnp.eye(3, dtype=R.dtype)
    Ai = (eye[None] - d[:, :, None] * d[:, None, :]) * w[:, None, None]
    A = jnp.sum(Ai, 0)
    rhs = jnp.sum(jnp.einsum("vij,vj->vi", Ai, C), 0)
    X = jnp.linalg.solve(A + 1e-9 * eye, rhs[..., None])[..., 0]
    nviews = jnp.sum(mask.astype(jnp.int32))
    return X, nviews >= 2


def refine_pose(R, C, X, xn, w, iters: int = 10, damping: float = 1e-6):
    """Gauss–Newton pose polish on weighted 3D-2D correspondences in
    normalized coords (the post-RANSAC nonlinear refinement OpenMVG runs
    inside its resection).  R: (3,3), C: (3,), X: (N,3), xn: (N,2),
    w: (N,) weights. Returns (R, C)."""

    def residual(dw, dC, R, C):
        Rn = cameras.exp_so3(dw) @ R
        Cn = C + dC
        xc = jnp.einsum("ij,nj->ni", Rn, X - Cn)
        z = jnp.where(jnp.abs(xc[:, 2]) > 1e-9, xc[:, 2], 1e-9)
        return (xc[:, :2] / z[:, None] - xn) * w[:, None]

    z3 = jnp.zeros(3, X.dtype)

    def body(_, carry):
        R, C = carry
        J = jax.jacfwd(residual, argnums=(0, 1))(z3, z3, R, C)
        Jm = jnp.concatenate([J[0].reshape(-1, 3), J[1].reshape(-1, 3)], -1)
        r = residual(z3, z3, R, C).reshape(-1)
        H = Jm.T @ Jm + damping * jnp.eye(6, dtype=X.dtype)
        g = Jm.T @ r
        d = -jnp.linalg.solve(H, g[:, None])[:, 0]
        return cameras.exp_so3(d[:3]) @ R, C + d[3:]

    return jax.lax.fori_loop(0, iters, body, (R, C))
