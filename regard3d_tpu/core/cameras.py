"""Camera models as pure JAX functions (batched, jit/vmap/grad-friendly).

Parity target: the 5 OpenMVG camera models exposed by the reference GUI
(``src/R3DProject.cpp:1167-1191``): pinhole, radial-K1, radial-K3 (default),
Brown-T2, fisheye — including distortion application and inversion, plus the
SO(3) utilities every SfM stage needs.

Design: instead of per-point dynamic dispatch, distortion is computed as a
masked blend over the (tiny) model menu — all five polynomials are cheap VPU
work, and a static ``lax.switch`` on a *traced per-intrinsic* model code would
block vectorization across intrinsic groups.  Undistortion is a fixed
iteration count Newton/fixed-point loop (static shapes for XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from regard3d_tpu.core.types import (BROWN_T2, FISHEYE, PINHOLE, RADIAL_K1,
                                     RADIAL_K3)

# ---------------------------------------------------------------------------
# SO(3) utilities
# ---------------------------------------------------------------------------

def hat(w):
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def exp_so3(w):
    """Rodrigues: angle-axis (..., 3) -> rotation matrices (..., 3, 3).

    Taylor-guarded near zero so it is safe under jit and grad."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def rot_to_quat(R):
    """Rotation (..., 3, 3) -> unit quaternion (w,x,y,z), w >= 0.

    Shepperd's method, branch-free (4-way where on the largest of
    trace / diagonal entries) — numerically robust for angles near pi."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate 0: trace
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], -1)
    # candidate 1: m00 largest
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], -1)
    # candidate 2: m11 largest
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], -1)
    # candidate 3: m22 largest
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], -1)

    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q_diag = jnp.where(cond1[..., None], q1,
                       jnp.where(cond2[..., None], q2, q3))
    q = jnp.where((tr > 0.0)[..., None], q0, q_diag)
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def log_so3(R):
    """Rotation matrices (..., 3, 3) -> angle-axis (..., 3).

    Via quaternion for robustness across the whole angle range."""
    q = rot_to_quat(R)
    w = q[..., 0]
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-8, 2.0 / jnp.maximum(w, 1e-8),
                      theta / jnp.maximum(vn, 1e-32))
    return v * scale[..., None]


def quat_to_rot(q):
    """Unit quaternion (w,x,y,z) (..., 4) -> rotation (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def project_so3(M):
    """Nearest rotation matrix via SVD (orthogonal Procrustes)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    return (U * D[..., None, :]) @ Vt


# ---------------------------------------------------------------------------
# Distortion — normalized camera coordinates in/out
# ---------------------------------------------------------------------------

def _disto_all_models(params, xu):
    """Return distorted coords under every model. xu: (..., 2); params (..., 9)
    broadcastable against xu's batch dims. Output: dict model -> (..., 2)."""
    d = params[..., 3:]
    x, y = xu[..., 0], xu[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2

    out = {}
    out[PINHOLE] = xu
    out[RADIAL_K1] = xu * (1.0 + d[..., 0] * r2)[..., None]
    radial3 = 1.0 + d[..., 0] * r2 + d[..., 1] * r4 + d[..., 2] * r6
    out[RADIAL_K3] = xu * radial3[..., None]
    # Brown T2: radial K3 + tangential (t1=d3, t2=d4)
    t1, t2 = d[..., 3], d[..., 4]
    tx = 2.0 * t1 * x * y + t2 * (r2 + 2.0 * x * x)
    ty = t1 * (r2 + 2.0 * y * y) + 2.0 * t2 * x * y
    out[BROWN_T2] = jnp.stack([x * radial3 + tx, y * radial3 + ty], -1)
    # Fisheye: theta-polynomial (k1..k4)
    r = jnp.sqrt(r2 + 1e-32)
    theta = jnp.arctan(r)
    th2 = theta * theta
    theta_d = theta * (1.0 + d[..., 0] * th2 + d[..., 1] * th2 ** 2
                       + d[..., 2] * th2 ** 3 + d[..., 3] * th2 ** 4)
    inv_r = jnp.where(r > 1e-8, 1.0 / r, 1.0)
    cdist = jnp.where(r > 1e-8, theta_d * inv_r, 1.0)
    out[FISHEYE] = xu * cdist[..., None]
    return out


def add_disto(model, params, xu):
    """Apply distortion. model: (...,) int32 (broadcast), params: (..., 9),
    xu: (..., 2) normalized undistorted -> distorted."""
    outs = _disto_all_models(params, xu)
    res = outs[PINHOLE]
    for code in (RADIAL_K1, RADIAL_K3, BROWN_T2, FISHEYE):
        res = jnp.where((model == code)[..., None], outs[code], res)
    return res


def remove_disto(model, params, xd, iters: int = 10):
    """Invert distortion by fixed-point iteration (OpenMVG uses a similar
    iterative inverse). xd: (..., 2) distorted -> undistorted."""
    def body(_, xu):
        # xu_{k+1} = xu_k + (xd - D(xu_k))  — contraction for mild distortion
        return xu + (xd - add_disto(model, params, xu))
    return jax.lax.fori_loop(0, iters, body, xd)


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

def cam_to_image(params, xn):
    """Normalized (distorted) coords -> pixels. params (..., 9): [f, cx, cy, ...]."""
    f = params[..., 0:1]
    c = params[..., 1:3]
    return xn * f + c


def image_to_cam(params, uv):
    f = params[..., 0:1]
    c = params[..., 1:3]
    return (uv - c) / f


def undistort_pixel(model, params, uv, iters: int = 10):
    """Pixel -> undistorted pixel (for UndistortImage parity,
    src/utils/OpenMVGHelper.cpp:3026)."""
    xn = image_to_cam(params, uv)
    xu = remove_disto(model, params, xn, iters)
    return cam_to_image(params, xu)


def distort_pixel(model, params, uv):
    xn = image_to_cam(params, uv)
    xd = add_disto(model, params, xn)
    return cam_to_image(params, xd)


def world_to_cam(R, C, X):
    """x_cam = R @ (X - C). R: (..., 3, 3), C: (..., 3), X: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, X - C)


def project(R, C, model, params, X):
    """Full projection world point -> pixel. Returns (uv, depth)."""
    xc = world_to_cam(R, C, X)
    depth = xc[..., 2]
    xn = xc[..., :2] / jnp.where(jnp.abs(depth) > 1e-12, depth, 1e-12)[..., None]
    xd = add_disto(model, params, xn)
    return cam_to_image(params, xd), depth


def reprojection_residual(R, C, model, params, X, uv):
    """Residual in pixels (..., 2) — the BA residual block."""
    proj, _ = project(R, C, model, params, X)
    return proj - uv


def bearing(model, params, uv, iters: int = 10):
    """Pixel -> unit bearing vector in the camera frame."""
    xn = image_to_cam(params, uv)
    xu = remove_disto(model, params, xn, iters)
    v = jnp.concatenate([xu, jnp.ones_like(xu[..., :1])], -1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
