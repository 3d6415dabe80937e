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
import numpy as np

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
# Fast batched small linear algebra (no LAPACK-style custom calls)
#
# TPU rationale: XLA's batched eigh/svd/lu lower to iterative decomposition
# loops that dominate the robust-estimation profile (95% of ACRANSAC time was
# `eigh(9x9)` + `svd(3x3)` over 16k samples). Everything here is unrolled
# static-step elementwise/matmul code that XLA fuses into a few kernels.
# ---------------------------------------------------------------------------

def chol_solve(A, b):
    """Solve SPD systems by unrolled Cholesky. A: (S, n, n), b: (S, n).

    n is static and small (<=16); no pivoting is needed for SPD inputs, so
    the whole factorization is static slices + fused einsums."""
    S, n, _ = A.shape
    L = jnp.zeros_like(A)
    for j in range(n):
        if j > 0:
            accum = jnp.einsum("si,sji->sj", L[:, j, :j], L[:, :, :j])
        else:
            accum = jnp.zeros_like(A[:, :, 0])
        cj = A[:, :, j] - accum                        # (S, n)
        d = jnp.sqrt(jnp.maximum(cj[:, j], 1e-30))
        colj = cj / d[:, None]
        colj = jnp.where(jnp.arange(n)[None, :] >= j, colj, 0.0)
        L = L.at[:, :, j].set(colj)
    y = jnp.zeros_like(b)
    for i in range(n):
        yi = (b[:, i] - jnp.einsum("sk,sk->s", L[:, i, :i], y[:, :i])) \
            / L[:, i, i]
        y = y.at[:, i].set(yi)
    x = jnp.zeros_like(b)
    for i in range(n - 1, -1, -1):
        xi = (y[:, i] - jnp.einsum("sk,sk->s", L[:, i + 1:, i],
                                   x[:, i + 1:])) / L[:, i, i]
        x = x.at[:, i].set(xi)
    return x


def smallest_eigvec(AtA, iters: int = 2):
    """Eigenvector of the smallest eigenvalue of a PSD matrix batch
    (S, n, n) by shifted inverse iteration with the unrolled Cholesky.

    For minimal RANSAC samples lambda_min ~ 0 << lambda_2, so one solve
    amplifies the nullspace by ~1/eps and two iterations are exact to f32;
    for weighted least-squares refits the gap is smaller but 2-3 iterations
    still dominate the old batched ``eigh`` by ~50x on TPU."""
    S, n, _ = AtA.shape
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    # the shift must dominate f32 roundoff in AtA (the numerical lambda_min
    # of a rank-deficient Gram matrix can be NEGATIVE ~ -1e-7*tr, where a
    # smaller shift makes Cholesky produce NaN)
    eps = 3e-7 * tr + 1e-30
    M = AtA + eps[:, None, None] * jnp.eye(n, dtype=AtA.dtype)
    # fixed unstructured start vector (irrational mix; never exactly
    # orthogonal to a data nullspace in float)
    v0 = jnp.cos(jnp.arange(1, n + 1, dtype=AtA.dtype) * 1.6180339887)
    v0 = jnp.broadcast_to(v0 / jnp.linalg.norm(v0), (S, n))
    v = v0
    for _ in range(iters):
        v = chol_solve(M, v)
        # overflow-safe renormalization: rank-deficient samples (duplicate
        # points) can amplify past f32 range inside one solve; degenerate
        # rows reset to the start vector (their model scores poorly anyway)
        m = jnp.max(jnp.abs(v), -1, keepdims=True)
        v = v / jnp.maximum(m, 1e-30)
        v = jnp.where(jnp.isfinite(v), v, 0.0)
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-30), v0)
    return v


def inv3x3(A):
    """Closed-form (adjugate) inverse of a 3x3 batch (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det,
                              jnp.where(det >= 0, 1e-30, -1e-30))
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def solve3x3(A, b):
    """Closed-form 3x3 solve. A: (..., 3, 3), b: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)


def eigh3x3(A):
    """Analytic symmetric 3x3 eigendecomposition (trigonometric method).

    A: (..., 3, 3) symmetric. Returns (w (..., 3) DESCENDING, V (..., 3, 3)
    columns = eigenvectors). Eigenvectors via the cross-product of the two
    best-conditioned rows of (A - lambda I); v_mid = v_min x v_max keeps the
    basis orthonormal even near-degenerate."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.einsum("...ij,...ij->...", B, B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    degenerate = p2 < 1e-24
    psafe = jnp.where(degenerate, 1.0, p)
    detB = jnp.linalg.det(B / psafe[..., None, None])
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w0 = q + 2.0 * psafe * jnp.cos(phi)                       # largest
    w2 = q + 2.0 * psafe * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2
    w0 = jnp.where(degenerate, q, w0)
    w1 = jnp.where(degenerate, q, w1)
    w2 = jnp.where(degenerate, q, w2)

    def eigvec(lmbda):
        C = A - lmbda[..., None, None] * eye
        r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1)
        n02 = jnp.sum(c02 * c02, -1)
        n12 = jnp.sum(c12 * c12, -1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], -1), -1)
        cands = jnp.stack([c01, c02, c12], -2)
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                                -2)[..., 0, :]
        nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], A.dtype),
                                    v.shape)
        return jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-30), fallback)

    vmax = eigvec(w0)
    vmin = eigvec(w2)
    # re-orthogonalize vmin against vmax, then complete the basis
    vmin = vmin - jnp.sum(vmin * vmax, -1, keepdims=True) * vmax
    nmin = jnp.linalg.norm(vmin, axis=-1, keepdims=True)
    alt = jnp.cross(vmax, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], A.dtype), vmax.shape))
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True),
                            1e-30)
    vmin = jnp.where(nmin > 1e-12, vmin / jnp.maximum(nmin, 1e-30), alt)
    vmid = jnp.cross(vmin, vmax)
    V = jnp.stack([vmax, vmid, vmin], -1)

    # One cyclic Jacobi sweep polishes V: with (near-)repeated eigenvalues
    # the cross-product method mixes the degenerate subspace arbitrarily
    # (essential matrices have sigma1 = sigma2); Jacobi rotations converge
    # quadratically from a near-diagonal start and are pure elementwise ops.
    for (pi, qi) in ((0, 1), (0, 2), (1, 2)):
        vp = V[..., :, pi]
        vq = V[..., :, qi]
        Avp = jnp.einsum("...ij,...j->...i", A, vp)
        Avq = jnp.einsum("...ij,...j->...i", A, vq)
        app = jnp.sum(vp * Avp, -1)
        aqq = jnp.sum(vq * Avq, -1)
        apq = jnp.sum(vp * Avq, -1)
        theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
        c = jnp.cos(theta)[..., None]
        s = jnp.sin(theta)[..., None]
        V = V.at[..., :, pi].set(c * vp + s * vq)
        V = V.at[..., :, qi].set(c * vq - s * vp)
    # Rayleigh-quotient eigenvalues of the polished basis, sorted descending
    AV = jnp.einsum("...ij,...jk->...ik", A, V)
    w = jnp.einsum("...ik,...ik->...k", V, AV)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, -1)
    V = jnp.take_along_axis(V, order[..., None, :], -1)
    return w, V


def svd3x3(F):
    """Analytic 3x3 SVD from eigh3x3 of F^T F. F: (..., 3, 3).

    Returns (U, s, Vt) with s descending; U's third column is completed as
    u0 x u1 so U stays orthonormal even for rank-2 inputs (the common case
    here: fundamental/essential projections). Note: for full-rank inputs the
    sign of the third singular triple is not recovered (F = U diag(s1, s2,
    +-s3) Vt) — every caller here zeroes s3, where the identity is exact.
    U and V are always proper rotations (third column = cross product)."""
    w, V = eigh3x3(jnp.einsum("...ji,...jk->...ik", F, F))
    # proper-rotation V: flip the third column if the eigh basis is
    # left-handed (eigenvector signs are free; the zeroed third singular
    # triple makes the flip reconstruction-neutral)
    detV = jnp.linalg.det(V)
    V = V.at[..., :, 2].multiply(jnp.where(detV < 0, -1.0, 1.0)[..., None])
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    FV = jnp.einsum("...ij,...jk->...ik", F, V)
    u0 = FV[..., :, 0] / jnp.maximum(s[..., 0:1], 1e-30)
    u1 = FV[..., :, 1] / jnp.maximum(s[..., 1:2], 1e-30)
    # guard rank-1 inputs: orthonormalize u1 against u0
    u1 = u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    alt = jnp.cross(u0, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], F.dtype), u0.shape))
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True),
                            1e-30)
    u1 = jnp.where(n1 > 1e-12, u1 / jnp.maximum(n1, 1e-30), alt)
    u2 = jnp.cross(u0, u1)
    U = jnp.stack([u0, u1, u2], -1)
    return U, s, jnp.swapaxes(V, -1, -2)


def _smallest_singular_vector(A):
    """Right singular vector of the smallest singular value. A: (S, m, n)."""
    AtA = jnp.einsum("smi,smj->sij", A, A)
    return smallest_eigvec(AtA)


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
    # rank-2 projection (analytic 3x3 SVD — no LAPACK-style batched svd)
    U, s, Vt = svd3x3(F)
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
    U, s, Vt = svd3x3(F)
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
    Hd = inv3x3(T2) @ H @ T1
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
    Hinv = inv3x3(H)
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
    return solve3x3(A + 1e-12 * jnp.eye(3, dtype=A.dtype), b)


def decompose_essential(E, x1, x2, mask=None):
    """Four-way decomposition of E with cheirality voting.

    E: (S, 3, 3); x1, x2: (S, N, 2) normalized camera coords; ``mask``
    (S, N) optional — only masked points vote (padded batched callers).
    Returns (R (S,3,3), t (S,3), ngood (S,)) — pose of camera 2
    such that x_cam2 = R @ (X - C2) with C1 = 0, and t = -R C2 (unit norm)."""
    U, _, Vt = svd3x3(E)   # proper rotations by construction (see svd3x3)
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
        good = (z1 > 0) & (z2 > 0)
        if mask is not None:
            good = good & mask
        return jnp.sum(good.astype(jnp.int32), -1)

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
# Batched polynomial root finding + pivoted solves (minimal-solver support)
# ---------------------------------------------------------------------------

def lu_solve(A, B):
    """Unrolled partial-pivot Gaussian elimination, batched.
    A: (S, n, n), B: (S, n, m) -> X with A @ X = B. n static & small."""
    S, n, _ = A.shape
    M = jnp.concatenate([A, B], -1)                    # (S, n, n+m)
    for k in range(n):
        col = jnp.abs(M[:, :, k])
        col = jnp.where(jnp.arange(n)[None, :] < k, -1.0, col)
        p = jnp.argmax(col, axis=1)
        rows = jnp.broadcast_to(jnp.arange(n)[None, :], (S, n))
        rk = jnp.where(rows == k, p[:, None],
                       jnp.where(rows == p[:, None], k, rows))
        M = jnp.take_along_axis(M, rk[:, :, None], axis=1)
        piv = M[:, k:k + 1, :]
        den = piv[:, :, k:k + 1]
        den = jnp.where(jnp.abs(den) > 1e-20, den,
                        jnp.where(den >= 0, 1e-20, -1e-20))
        fac = M[:, :, k:k + 1] / den
        mask = (jnp.arange(n)[None, :, None] != k)
        M = M - jnp.where(mask, fac * piv, 0.0)
    den = jnp.diagonal(M[:, :, :n], axis1=1, axis2=2)[..., None]
    den = jnp.where(jnp.abs(den) > 1e-20, den,
                    jnp.where(den >= 0, 1e-20, -1e-20))
    return M[:, :, n:] / den


def poly_roots(coeffs, iters: int = 60):
    """All complex roots of polynomials by Durand–Kerner iteration.

    coeffs: (S, D+1) ASCENDING (coeffs[..., k] multiplies z^k), complex or
    real. Fully batched/elementwise — the TPU substitute for companion-
    matrix eigensolvers (no nonsymmetric eig on TPU). Returns (S, D)
    complex roots."""
    coeffs = coeffs.astype(jnp.complex64)
    S, D1 = coeffs.shape
    D = D1 - 1
    lead = coeffs[:, -1:]
    lead = jnp.where(jnp.abs(lead) > 1e-25, lead, 1e-25)
    c = coeffs / lead                                   # monic
    # root bound (Cauchy): 1 + max |c_k|
    bound = 1.0 + jnp.max(jnp.abs(c[:, :-1]), axis=1, keepdims=True)
    k = jnp.arange(D)
    init = (0.4 + 0.9j) ** (k + 1)
    z = init[None, :] * bound.astype(jnp.complex64)

    powers = jnp.arange(D1)

    def p_of(z):
        return jnp.sum(c[:, None, :] * z[..., None] ** powers, -1)

    def body(_, z):
        pz = p_of(z)
        diff = z[:, :, None] - z[:, None, :]
        diff = jnp.where(jnp.eye(D, dtype=bool), 1.0, diff)
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        return z - pz / denom

    # rolled loop: the unrolled iteration made XLA graphs (and compiles)
    # ~iters x larger for zero runtime benefit
    return jax.lax.fori_loop(0, iters, body, z)


def kabsch(Pw, Pc):
    """Rigid transform world->camera from point pairs: finds (R, C) with
    Pc ~ R (Pw - C). Pw, Pc: (S, n, 3) (n >= 3)."""
    mw = Pw.mean(-2, keepdims=True)
    mc = Pc.mean(-2, keepdims=True)
    H = jnp.einsum("sni,snj->sij", Pc - mc, Pw - mw)
    U, _, Vt = svd3x3(H)
    R = U @ Vt
    # svd3x3 returns proper rotations (det +1) by construction
    C = mw[:, 0] - jnp.einsum("sji,sj->si", R, mc[:, 0])
    return R, C


# ---------------------------------------------------------------------------
# Nistér 5-point essential solver, batched.
#
# The reference's OpenMVG essential ACRANSAC uses the 5-point minimal
# solver (SURVEY §2.3/§7): minimal samples keep RANSAC's inlier-sample
# probability high at large outlier ratios and avoid the 8-point solver's
# planar degeneracy. TPU formulation: the classical action reduces to
# (a) a 4-dim nullspace via subspace inverse iteration (no LAPACK eigh),
# (b) host-precomputed monomial multiplication tables turning the ten
# cubic constraints into a batched (S, 10, 20) coefficient tensor,
# (c) one pivoted 10x10 solve, (d) a degree-10 univariate polynomial whose
# roots come from batched Durand–Kerner iteration + real Newton polish
# (no nonsymmetric eigensolver exists on TPU).
# ---------------------------------------------------------------------------

# monomial power tuples; order follows Nistér's elimination grouping
_MON3 = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1), (2, 0, 0),
         (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0), (1, 0, 2), (1, 0, 1),
         (1, 0, 0), (0, 1, 2), (0, 1, 1), (0, 1, 0), (0, 0, 3), (0, 0, 2),
         (0, 0, 1), (0, 0, 0)]
_LIN = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_QUAD = [(2, 0, 0), (0, 2, 0), (0, 0, 2), (1, 1, 0), (1, 0, 1), (0, 1, 1),
         (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_M3IDX = {m: i for i, m in enumerate(_MON3)}
_QIDX = {m: i for i, m in enumerate(_QUAD)}


def _padd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _mul_ll(a, b):
    """(..., 4) x (..., 4) linear forms -> (..., 10) quadratic coeffs."""
    out = [0.0] * 10
    for i, pi in enumerate(_LIN):
        for j, pj in enumerate(_LIN):
            out[_QIDX[_padd(pi, pj)]] = (out[_QIDX[_padd(pi, pj)]]
                                         + a[..., i] * b[..., j])
    return jnp.stack(out, -1)


def _mul_ql(a, b):
    """(..., 10) quadratic x (..., 4) linear -> (..., 20) cubic coeffs."""
    out = [0.0] * 20
    for i, pi in enumerate(_QUAD):
        for j, pj in enumerate(_LIN):
            out[_M3IDX[_padd(pi, pj)]] = (out[_M3IDX[_padd(pi, pj)]]
                                          + a[..., i] * b[..., j])
    return jnp.stack(out, -1)


def _polymul(a, b):
    """1-D polynomial product over the last axis (ascending coeffs)."""
    la = a.shape[-1]
    lb = b.shape[-1]
    out = [0.0] * (la + lb - 1)
    for i in range(la):
        for j in range(lb):
            out[i + j] = out[i + j] + a[..., i] * b[..., j]
    return jnp.stack(out, -1)


def _nullspace4(AtA, iters: int = 3):
    """4 smallest-eigenvalue eigenvectors of PSD (S, 9, 9) by subspace
    inverse iteration + unrolled Gram-Schmidt."""
    S = AtA.shape[0]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)
    # shift above f32 Gram-matrix roundoff (see smallest_eigvec)
    eps = 1e-6 * tr + 1e-30
    M = AtA + eps[:, None, None] * jnp.eye(9, dtype=AtA.dtype)
    rng = np.random.default_rng(7)
    V = jnp.broadcast_to(
        jnp.asarray(rng.normal(size=(9, 4)), AtA.dtype), (S, 9, 4))

    def orthonormalize(V):
        cols = []
        for c in range(4):
            v = V[..., c]
            for u in cols:
                v = v - jnp.sum(v * u, -1, keepdims=True) * u
            m = jnp.max(jnp.abs(v), -1, keepdims=True)
            v = v / jnp.maximum(m, 1e-30)
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            n = jnp.linalg.norm(v, axis=-1, keepdims=True)
            fallback = jnp.zeros_like(v).at[..., c].set(1.0)
            v = jnp.where(n > 1e-12, v / jnp.maximum(n, 1e-30), fallback)
            cols.append(v)
        return jnp.stack(cols, -1)

    for _ in range(iters):
        V = jax.vmap(lambda b: chol_solve(M, b), in_axes=2, out_axes=2)(V)
        V = orthonormalize(V)
    return V                                            # (S, 9, 4)


def fit_essential_5pt(x1, x2):
    """Nistér 5-point essential. x1, x2: (S, 5, 2) normalized camera
    coords. Returns (E (S, 10, 3, 3), ok (S, 10)) — up to 10 real
    solutions per sample; invalid slots masked."""
    S = x1.shape[0]
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                   u1, v1, ones], -1)                    # (S, 5, 9)
    # row-normalize (nullspace-invariant): keeps the Gram matrix O(1) so
    # the inverse-iteration shift separates nullspace from data directions
    # even for points near a camera plane (huge normalized coords)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("smi,smj->sij", A, A)
    N4 = _nullspace4(AtA)                                # (S, 9, 4)
    # E(x,y,z) entries as linear forms over [x, y, z, 1]
    e = N4.reshape(S, 3, 3, 4)

    def lin(i, j):
        return e[:, i, j]

    # det(E) cubic
    def det3():
        terms = []
        for (i0, i1, i2, sgn) in (((0, 0), (1, 1), (2, 2), 1.0),
                                  ((0, 1), (1, 2), (2, 0), 1.0),
                                  ((0, 2), (1, 0), (2, 1), 1.0),
                                  ((0, 2), (1, 1), (2, 0), -1.0),
                                  ((0, 0), (1, 2), (2, 1), -1.0),
                                  ((0, 1), (1, 0), (2, 2), -1.0)):
            q = _mul_ll(lin(*i0), lin(*i1))
            terms.append(sgn * _mul_ql(q, lin(*i2)))
        return sum(terms)

    # EE^T entries (quadratic) and the trace constraint cubics
    EEt = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            s = None
            for k in range(3):
                q = _mul_ll(lin(i, k), lin(j, k))
                s = q if s is None else s + q
            EEt[i][j] = s
    trEEt = EEt[0][0] + EEt[1][1] + EEt[2][2]            # (S, 10)

    rows = [det3()]
    for i in range(3):
        for j in range(3):
            s = None
            for k in range(3):
                c = _mul_ql(EEt[i][k], lin(k, j))
                s = c if s is None else s + c
            rows.append(2.0 * s - _mul_ql(trEEt, lin(i, j)))
    M = jnp.stack(rows, 1)                               # (S, 10, 20)

    # Gauss-Jordan: reduce the 10 leading monomials (+ one iterative
    # refinement pass: the 10x10 is the conditioning bottleneck in f32)
    A10 = M[:, :, :10]
    B10 = M[:, :, 10:]
    C10 = lu_solve(A10, B10)                             # (S, 10, 10)
    C10 = C10 + lu_solve(A10, B10 - jnp.einsum(
        "sij,sjk->sik", A10, C10))
    # rows <e>..<j> lead with x^2 z, x^2, y^2 z, y^2, xyz, xy (indices 4-9)
    ce, cf, cg, ch, ci, cj = (C10[:, r] for r in range(4, 10))

    def row_polys(c_hi, c_lo):
        """<hi> - z*<lo>: returns (alpha(z) deg3, beta(z) deg3,
        gamma(z) deg4) ascending coefficient arrays."""
        def shift(p):   # multiply by z: ascending shift
            return jnp.concatenate([jnp.zeros_like(p[..., :1]), p], -1)
        # B-monomial layout: [xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1]
        ax = jnp.stack([c_hi[:, 2], c_hi[:, 1], c_hi[:, 0]], -1)  # deg2 asc
        bx = jnp.stack([c_hi[:, 5], c_hi[:, 4], c_hi[:, 3]], -1)
        gx = jnp.stack([c_hi[:, 9], c_hi[:, 8], c_hi[:, 7],
                        c_hi[:, 6]], -1)                           # deg3 asc
        al = jnp.stack([c_lo[:, 2], c_lo[:, 1], c_lo[:, 0]], -1)
        bl = jnp.stack([c_lo[:, 5], c_lo[:, 4], c_lo[:, 3]], -1)
        gl = jnp.stack([c_lo[:, 9], c_lo[:, 8], c_lo[:, 7],
                        c_lo[:, 6]], -1)
        pad1 = lambda p: jnp.concatenate(
            [p, jnp.zeros_like(p[..., :1])], -1)
        alpha = pad1(ax) - shift(al)                     # deg3 (4)
        beta = pad1(bx) - shift(bl)
        gamma = pad1(gx) - shift(gl)                     # deg4 (5)
        return alpha, beta, gamma

    a1, b1, g1 = row_polys(ce, cf)
    a2, b2, g2 = row_polys(cg, ch)
    a3, b3, g3 = row_polys(ci, cj)

    # the constraint rows read: x*alpha + y*beta + gamma = 0 at solutions;
    # wait — the reduced rows are [lead | C10] = 0, i.e. lead = -C10 part.
    # <hi> - z<lo> eliminates the leads, leaving exactly the B-part
    # combination = 0, so the sign convention above is consistent.
    # det of [[a1 b1 g1], [a2 b2 g2], [a3 b3 g3]] -> degree-10 polynomial
    def pdet():
        m1 = _polymul(b2, g3) - _polymul(b3, g2)         # deg 7 (8)
        m2 = _polymul(a2, g3) - _polymul(a3, g2)
        m3 = _polymul(a2, b3) - _polymul(a3, b2)         # deg 6 (7)
        return (_polymul(a1, m1) - _polymul(b1, m2)
                + _polymul(g1, m3))                      # deg 10 (11)

    n10 = pdet()
    roots = poly_roots(n10, iters=80)                    # (S, 10) complex
    z = jnp.real(roots)
    real = jnp.abs(jnp.imag(roots)) < 1e-2 * (1.0 + jnp.abs(z))

    # Newton polish on the real polynomial
    powers = jnp.arange(11, dtype=x1.dtype)
    dcoef = n10[:, 1:] * jnp.arange(1, 11, dtype=x1.dtype)
    for _ in range(3):
        pz = jnp.sum(n10[:, None, :] * z[..., None] ** powers, -1)
        dz = jnp.sum(dcoef[:, None, :] * z[..., None] ** powers[:10], -1)
        dz = jnp.where(jnp.abs(dz) > 1e-25, dz,
                       jnp.where(dz >= 0, 1e-25, -1e-25))
        z = z - pz / dz

    def peval(p, zz):
        pw = jnp.arange(p.shape[-1], dtype=zz.dtype)
        return jnp.sum(p[:, None, :] * zz[..., None] ** pw, -1)

    A1 = peval(a1, z); B1 = peval(b1, z); G1 = peval(g1, z)
    A2 = peval(a2, z); B2 = peval(b2, z); G2 = peval(g2, z)
    A3 = peval(a3, z); B3 = peval(b3, z); G3 = peval(g3, z)
    # solve the best-conditioned 2x2 of the three row pairs for (x, y)
    dets = jnp.stack([A1 * B2 - A2 * B1, A1 * B3 - A3 * B1,
                      A2 * B3 - A3 * B2], -1)            # (S, 10, 3)
    pick = jnp.argmax(jnp.abs(dets), -1)
    d = jnp.take_along_axis(dets, pick[..., None], -1)[..., 0]
    d = jnp.where(jnp.abs(d) > 1e-20, d,
                  jnp.where(d >= 0, 1e-20, -1e-20))
    xs = jnp.stack([(-G1 * B2 + G2 * B1), (-G1 * B3 + G3 * B1),
                    (-G2 * B3 + G3 * B2)], -1)
    ys = jnp.stack([(-A1 * G2 + A2 * G1), (-A1 * G3 + A3 * G1),
                    (-A2 * G3 + A3 * G2)], -1)
    xv = jnp.take_along_axis(xs, pick[..., None], -1)[..., 0] / d
    yv = jnp.take_along_axis(ys, pick[..., None], -1)[..., 0] / d

    # assemble E = x B1 + y B2 + z B3 + B4 per root
    basis = N4.reshape(S, 1, 3, 3, 4)
    E = (xv[..., None, None] * basis[..., 0]
         + yv[..., None, None] * basis[..., 1]
         + z[..., None, None] * basis[..., 2]
         + basis[..., 3])                                # (S, 10, 3, 3)
    nrm = jnp.linalg.norm(E.reshape(S, 10, 9), axis=-1)
    ok = real & (nrm > 1e-12) & jnp.isfinite(E).all((-2, -1))
    E = E / jnp.maximum(nrm, 1e-12)[..., None, None]
    return E, ok


# ---------------------------------------------------------------------------
# P3P (Grunert's quartic) — the minimal resection solver OpenMVG uses
# inside ACRANSAC (SURVEY §2.3; replaces 6-pt DLT minimal samples)
# ---------------------------------------------------------------------------

def p3p_grunert(X, x):
    """Poses from 3 world points + 3 normalized image points.

    X: (S, 3, 3) world points; x: (S, 3, 2) normalized camera coords.
    Returns (R (S, 4, 3, 3), C (S, 4, 3), ok (S, 4)) — up to 4 solutions
    per sample (Grunert 1841 / Haralick's review: law-of-cosines system
    reduced to a quartic; solved batched by Durand–Kerner)."""
    S = X.shape[0]
    f = to_h(x)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)   # (S, 3, 3) bearings
    P1, P2, P3 = X[:, 0], X[:, 1], X[:, 2]
    a2 = jnp.sum((P2 - P3) ** 2, -1)
    b2 = jnp.sum((P1 - P3) ** 2, -1)
    c2 = jnp.sum((P1 - P2) ** 2, -1)
    b2s = jnp.maximum(b2, 1e-20)
    ca = jnp.sum(f[:, 1] * f[:, 2], -1)                  # cos(alpha)
    cb = jnp.sum(f[:, 0] * f[:, 2], -1)                  # cos(beta)
    cg = jnp.sum(f[:, 0] * f[:, 1], -1)                  # cos(gamma)

    p = (a2 - c2) / b2s
    q = (a2 + c2) / b2s
    A4 = (p - 1.0) ** 2 - 4.0 * (c2 / b2s) * ca ** 2
    A3 = 4.0 * (p * (1.0 - p) * cb - (1.0 - q) * ca * cg
                + 2.0 * (c2 / b2s) * ca ** 2 * cb)
    A2 = 2.0 * (p ** 2 - 1.0 + 2.0 * p ** 2 * cb ** 2
                + 2.0 * ((b2 - c2) / b2s) * ca ** 2
                - 4.0 * q * ca * cb * cg
                + 2.0 * ((b2 - a2) / b2s) * cg ** 2)
    A1 = 4.0 * (-p * (1.0 + p) * cb + 2.0 * (a2 / b2s) * cg ** 2 * cb
                - (1.0 - q) * ca * cg)
    A0 = (1.0 + p) ** 2 - 4.0 * (a2 / b2s) * cg ** 2

    coeffs = jnp.stack([A0, A1, A2, A3, A4], -1)          # ascending
    roots = poly_roots(coeffs)                            # (S, 4) complex
    v = jnp.real(roots)
    real = jnp.abs(jnp.imag(roots)) < 1e-3 * (1.0 + jnp.abs(v))
    # Newton polish in real arithmetic (f32 quartics are ill-conditioned)
    for _ in range(3):
        q = (((A4[:, None] * v + A3[:, None]) * v + A2[:, None]) * v
             + A1[:, None]) * v + A0[:, None]
        dq = ((4.0 * A4[:, None] * v + 3.0 * A3[:, None]) * v
              + 2.0 * A2[:, None]) * v + A1[:, None]
        dq = jnp.where(jnp.abs(dq) > 1e-12, dq,
                       jnp.where(dq >= 0, 1e-12, -1e-12))
        v = v - q / dq

    # back-substitution: u from v
    den_u = 2.0 * (cg[:, None] - v * ca[:, None])
    den_u = jnp.where(jnp.abs(den_u) > 1e-12, den_u,
                      jnp.where(den_u >= 0, 1e-12, -1e-12))
    u = ((-1.0 + p[:, None]) * v ** 2
         - 2.0 * p[:, None] * cb[:, None] * v + 1.0 + p[:, None]) / den_u
    s1sq = b2s[:, None] / jnp.maximum(
        1.0 + v ** 2 - 2.0 * v * cb[:, None], 1e-12)
    ok = real & (s1sq > 0) & (u > 0) & (v > 0)
    s1 = jnp.sqrt(jnp.maximum(s1sq, 0.0))
    s2 = u * s1
    s3 = v * s1

    # camera-frame points; absolute orientation per candidate via Kabsch
    Pc = jnp.stack([s1[..., None] * f[:, None, 0],
                    s2[..., None] * f[:, None, 1],
                    s3[..., None] * f[:, None, 2]], -2)   # (S, 4, 3pts, 3)
    Pw = jnp.broadcast_to(X[:, None], Pc.shape)
    R, C = kabsch(Pw.reshape(-1, 3, 3), Pc.reshape(-1, 3, 3))
    R = R.reshape(S, 4, 3, 3)
    C = C.reshape(S, 4, 3)
    ok = ok & jnp.isfinite(R).all((-2, -1)) & jnp.isfinite(C).all(-1)
    return R, C, ok


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
    X = solve3x3(A + 1e-9 * eye, rhs)
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
