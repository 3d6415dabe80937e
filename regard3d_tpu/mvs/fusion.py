"""Depth-map consistency filtering and fusion into a dense colored cloud.

Plays the role of PMVS's patch filtering + the reference's cluster-cloud
combine step (``src/R3DModelOperations.cpp:53-168``): a depth-map pixel
survives only if its 3D point reprojects into at least ``min_consistent``
source views whose own plane-sweep depths agree (relative inverse-depth
tolerance), mirroring PMVS's ``minImageNum`` visibility rule
(src/R3DProject.h:208).  Survivors are back-projected on the ``csize``
grid into a colored, normal-oriented point cloud.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.mvs.planesweep import bilinear_sample, box_sum


@functools.partial(jax.jit, static_argnames=())
def backproject_grid(idepth: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                     C: jnp.ndarray) -> jnp.ndarray:
    """Back-project a full depth map to world points. Returns (H, W, 3)."""
    H, W = idepth.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    d = 1.0 / jnp.maximum(idepth, 1e-9)
    Kinv = jnp.linalg.inv(K)
    pix = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32),
                     jnp.ones((H, W), jnp.float32)], -1)
    ray = jnp.einsum("ij,hwj->hwi", Kinv, pix)
    return C + jnp.einsum("ji,hwj->hwi", R, ray * d[..., None])


@functools.partial(jax.jit, static_argnames=("min_consistent",))
def consistency_mask(idepth: jnp.ndarray, valid: jnp.ndarray,
                     K: jnp.ndarray, R: jnp.ndarray, C: jnp.ndarray,
                     src_idepths: jnp.ndarray, src_valids: jnp.ndarray,
                     src_Ks: jnp.ndarray, src_Rs: jnp.ndarray,
                     src_Cs: jnp.ndarray, src_live: jnp.ndarray,
                     tol: float = 0.01, min_consistent: int = 2):
    """Geometric cross-view check for one reference depth map.

    Args:
      idepth/valid: (H, W) reference inverse depth + photometric mask.
      src_idepths/src_valids: (S, H, W) source depth maps.
      src_Ks/src_Rs/src_Cs: (S, 3, 3) / (S, 3, 3) / (S, 3) source cameras.
      src_live: (S,) bool — live sources.
    Returns (accept, X): (H, W) bool and (H, W, 3) world points.
    """
    X = backproject_grid(idepth, K, R, C)

    def per_source(s_idepth, s_valid, Ks, Rs, Cs, live):
        xc = jnp.einsum("ij,hwj->hwi", Rs, X - Cs)
        z = xc[..., 2]
        uvw = jnp.einsum("ij,hwj->hwi", Ks, xc)
        u = uvw[..., 0] / jnp.where(jnp.abs(uvw[..., 2]) > 1e-9,
                                    uvw[..., 2], 1e-9)
        v = uvw[..., 1] / jnp.where(jnp.abs(uvw[..., 2]) > 1e-9,
                                    uvw[..., 2], 1e-9)
        s_id, ok = bilinear_sample(s_idepth, u, v)
        s_ok, _ = bilinear_sample(s_valid.astype(jnp.float32), u, v)
        pid = 1.0 / jnp.maximum(z, 1e-9)
        agree = jnp.abs(s_id - pid) < tol * jnp.maximum(s_id, pid)
        return (ok & (z > 1e-6) & (s_ok > 0.99) & agree & live)

    votes = jax.vmap(per_source)(src_idepths, src_valids, src_Ks, src_Rs,
                                 src_Cs, src_live)
    accept = valid & (jnp.sum(votes.astype(jnp.int32), 0) >= min_consistent)
    return accept, X


@jax.jit
def grid_normals(X: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normals from the back-projected point grid (H, W, 3),
    oriented toward the camera center (PMVS patch-normal convention)."""
    dXu = jnp.gradient(X, axis=1)
    dXv = jnp.gradient(X, axis=0)
    n = jnp.cross(dXv, dXu)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    flip = jnp.sum(n * (C - X), -1, keepdims=True) < 0
    return jnp.where(flip, -n, n)


@functools.partial(jax.jit, static_argnames=("w",))
def smoothed_normals(idepth: jnp.ndarray, valid: jnp.ndarray,
                     K: jnp.ndarray, R: jnp.ndarray, C: jnp.ndarray,
                     w: int = 7) -> jnp.ndarray:
    """Normals from a validity-weighted box-smoothed depth map — the
    sub-plane refinement noise of the sweep is at the single-plane scale,
    far above what raw 1-px finite differences tolerate (PMVS fits a patch
    plane over wsize² samples for the same reason)."""
    vf = valid.astype(jnp.float32)
    num = box_sum(idepth * vf, w)
    den = jnp.maximum(box_sum(vf, w), 1.0)
    id_s = jnp.where(den > 0.5, num / den, idepth)
    return grid_normals(backproject_grid(id_s, K, R, C), C)


def fuse_points(accept: np.ndarray, X: np.ndarray, normals: np.ndarray,
                rgb: np.ndarray, csize: int = 2):
    """Host-side assembly: accepted pixels on the csize grid ->
    (xyz, normal, color) arrays."""
    acc = np.asarray(accept)[::csize, ::csize]
    Xg = np.asarray(X)[::csize, ::csize]
    Ng = np.asarray(normals)[::csize, ::csize]
    Cg = np.asarray(rgb)[::csize, ::csize]
    m = acc.reshape(-1)
    return (Xg.reshape(-1, 3)[m], Ng.reshape(-1, 3)[m],
            Cg.reshape(-1, 3)[m])
