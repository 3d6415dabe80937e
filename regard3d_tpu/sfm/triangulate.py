"""Track triangulation over the whole scene in one shot.

Instead of per-track loops (OpenMVG triangulates tracks one at a time inside
its engines), all tracks are solved simultaneously: each active observation
contributes its ray's rank-2 projector (I - d d^T) to its track's 3x3 normal
matrix via ``segment_sum``, and a batched 3x3 solve yields every track
position at once.  The minimum-triangulation-angle test becomes a spectral
test on the accumulated normal matrix (rays nearly parallel <=> the normal
matrix is nearly singular along the mean ray).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from regard3d_tpu.core import cameras


class TriangulationResult(NamedTuple):
    X: jnp.ndarray          # (T, 3)
    ok: jnp.ndarray         # (T,) bool — >=2 views, conditioned, cheirality
    nviews: jnp.ndarray     # (T,) int32 — contributing observations


def triangulate_tracks(R, C, pose_mask, track_id, view_id, obs_active,
                       bearings, num_tracks: int,
                       min_angle_deg: float = 2.0,
                       max_reproj_err: float = 4.0,
                       focal: float = 1000.0) -> TriangulationResult:
    """R: (V,3,3), C: (V,3), pose_mask: (V,); per-observation track_id /
    view_id / obs_active: (O,); bearings: (O, 3) unit bearings in their
    camera frame.  max_reproj_err in pixels, converted with `focal`."""
    T = num_tracks
    act = (obs_active & pose_mask[view_id]).astype(R.dtype)      # (O,)

    d = jnp.einsum("oji,oj->oi", R[view_id], bearings)           # world rays
    eye = jnp.eye(3, dtype=R.dtype)
    P = eye[None] - d[:, :, None] * d[:, None, :]                # (O, 3, 3)
    P = P * act[:, None, None]
    rhs = jnp.einsum("oij,oj->oi", P, C[view_id])

    A = segment_sum(P, track_id, T)                              # (T, 3, 3)
    b = segment_sum(rhs, track_id, T)
    n = segment_sum(act, track_id, T)

    X = jnp.linalg.solve(A + 1e-9 * eye[None], b[..., None])[..., 0]

    # conditioning / parallax test: for rays spanning angle theta the
    # smallest eigenvalue of A/n is ~ (1 - cos theta) — parallel rays give 0
    evals = jnp.linalg.eigvalsh(A + 1e-12 * eye[None])
    import math
    min_eig_needed = (1.0 - math.cos(math.radians(min_angle_deg)))
    conditioned = evals[:, 0] >= min_eig_needed * jnp.maximum(n, 1.0) * 0.5

    # cheirality + reprojection: every active obs must see X in front and
    # within the angular error bound
    Xo = X[track_id]
    xc = jnp.einsum("oij,oj->oi", R[view_id], Xo - C[view_id])
    depth_ok = xc[..., 2] > 1e-6
    proj = xc[..., :2] / jnp.where(depth_ok, xc[..., 2], 1.0)[..., None]
    bproj = bearings[..., :2] / jnp.maximum(bearings[..., 2:], 1e-9)
    err = jnp.sum((proj - bproj) ** 2, -1)
    err_ok = err <= (max_reproj_err / focal) ** 2
    obs_ok = jnp.where(act > 0, depth_ok & err_ok, True)
    all_ok = segment_sum((~obs_ok).astype(jnp.int32), track_id, T) == 0

    ok = (n >= 2) & conditioned & all_ok
    return TriangulationResult(X, ok, n.astype(jnp.int32))


def reprojection_residuals_px(R, C, intr, models, intr_id, view_id, track_id,
                              X, xy):
    """(O,) squared pixel residuals of each observation against its track."""
    params = intr[intr_id]
    model = models[intr_id]
    uv, depth = cameras.project(R[view_id], C[view_id], model, params,
                                X[track_id])
    r2 = jnp.sum((uv - xy) ** 2, -1)
    return jnp.where(depth > 0, r2, 1e12)
