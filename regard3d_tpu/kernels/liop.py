"""LIOP-144 descriptor — batched patch warp + intensity-order binning.

TPU-native rebuild of the reference's descriptor of record
(``Regard3DFeatures::extractLIOPFeatures``, src/Regard3DFeatures.cpp:719-861,
over the vendored VLFeat LIOP ``r3d_vl_liopdesc_process``,
src/thirdparty/liop/vl_liop.c:465-580).

Parity contract:
* 41x41 patch (patchResolution=20) warped from the image by the inverse
  affine map ``src = kp + scale*R(theta) @ (patch_xy - 20)`` with
  ``scale = kp.size/41 * kpSizeFactor`` and ``theta = -90deg - kp.angle_deg``
  where ``kp.angle_deg = rad2deg(angle)+90`` (the Fast-AKAZE angle fix at
  src/Regard3DFeatures.cpp:604-613) — net: theta = -pi - angle_rad.
* Gaussian smoothing sigma=1.2 on the patch.
* LIOP params (vl_liop defaults): n=4 neighbours on a radius-6 circle
  (rotation-aligned to each pixel's radial direction), 6 ordinal bins,
  adaptive intensity threshold 5/255*(max-min), 4!*6 = 144 dims, L2 norm.

Everything per-keypoint is static-shape: the circular pixel list, the
neighbour sample positions, and their bilinear gather taps are precomputed
host-side; the per-keypoint work is pure gathers + sorts + one-hot scatter,
vmapped over (keypoints, images) — replacing the reference's OpenMP/TBB
parallel-for (src/Regard3DFeatures.cpp:733-765, P3 in SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Descriptors, Keypoints, round_up
from regard3d_tpu.kernels.scale_space import conv_sep, gaussian_kernel1d

PATCH_RESOLUTION = 20
PATCH_SIZE = 2 * PATCH_RESOLUTION + 1          # 41
PATCH_SMOOTH_SIGMA = 1.2
NUM_NEIGHBOURS = 4
NUM_SPATIAL_BINS = 6
NEIGH_RADIUS = 6.0
INTENSITY_THRESHOLD = 5.0 / 255.0
LIOP_DIM = 144                                  # 4! * 6
PADDED_DIM = 256                                # lane-friendly storage

# Per-detector patch scale factors (NLOPT-tuned table,
# src/Regard3DFeatures.cpp:691-717)
KP_SIZE_FACTORS = {
    "AKAZE": 8.0, "Fast-AKAZE": 8.0, "DOG": 0.25, "MSER": 0.08,
    "ORB": 0.025, "BRISK": 0.15, "GFTT": 0.13, "HARRIS": 0.25, "TBMR": 1.0,
}


def _liop_tables():
    """Static LIOP geometry (vl_liopdesc_new parity): circular pixel list and
    per-pixel neighbour sample coords."""
    c = PATCH_RESOLUTION
    t = c - NEIGH_RADIUS + 0.6
    t2 = int(t * t)
    xs, ys = [], []
    for y in range(PATCH_SIZE):
        for x in range(PATCH_SIZE):
            dx, dy = x - c, y - c
            if x == 0 and y == 0:
                continue  # quirk kept for parity (outside circle anyway)
            if dx * dx + dy * dy <= t2:
                xs.append(x)
                ys.append(y)
    px = np.asarray(xs, np.int32)
    py = np.asarray(ys, np.int32)
    P = len(px)
    angle0 = np.arctan2(py - c, px - c)
    dangle = 2.0 * math.pi / NUM_NEIGHBOURS
    tt = np.arange(NUM_NEIGHBOURS)
    nx = px[:, None] - c + NEIGH_RADIUS * np.cos(angle0[:, None] + dangle * tt) + c
    ny = py[:, None] - c + NEIGH_RADIUS * np.sin(angle0[:, None] + dangle * tt) + c
    return px, py, nx.astype(np.float64), ny.astype(np.float64)


_PX, _PY, _NX, _NY = _liop_tables()
PATCH_NPIX = len(_PX)                           # number of circular pixels


def _bilinear_taps(nx, ny):
    """Static bilinear taps for the neighbour samples with the reference's
    zero-outside-border rule (vl_liop.c:531-543). Returns (idx (P,4,4),
    w (P,4,4)) into the flat 41*41 patch."""
    L = PATCH_SIZE
    ix = np.floor(nx).astype(np.int64)
    iy = np.floor(ny).astype(np.int64)
    wx = nx - ix
    wy = ny - iy
    taps_idx = np.zeros(nx.shape + (4,), np.int32)
    taps_w = np.zeros(nx.shape + (4,), np.float32)
    corners = [(0, 0, (1 - wx) * (1 - wy)), (1, 0, wx * (1 - wy)),
               (0, 1, (1 - wx) * wy), (1, 1, wx * wy)]
    for k, (ox, oy, w) in enumerate(corners):
        cx, cy = ix + ox, iy + oy
        # reference condition: tap contributes only if 0 <= ix and ix < L-1+ox
        ok = (cx >= 0) & (cx <= L - 1) & (cy >= 0) & (cy <= L - 1)
        taps_idx[..., k] = np.where(ok, cx + cy * L, 0)
        taps_w[..., k] = np.where(ok, w, 0.0)
    return taps_idx, taps_w.astype(np.float32)


_TAPS_IDX, _TAPS_W = _bilinear_taps(_NX, _NY)
_BIN_AREA = PATCH_NPIX // NUM_SPATIAL_BINS


def liop_from_patch(patch):
    """LIOP descriptor of one smoothed 41x41 patch -> (144,) float32."""
    flat = patch.reshape(-1)
    p_int = flat[jnp.asarray(_PX + _PY * PATCH_SIZE)]          # (P,)
    # neighbour intensities via static bilinear taps
    n_int = jnp.sum(flat[jnp.asarray(_TAPS_IDX)] * jnp.asarray(_TAPS_W), -1)

    # adaptive threshold from patch extrema (over circular pixels)
    thr = INTENSITY_THRESHOLD * (jnp.max(p_int) - jnp.min(p_int))

    # ordinal (intensity-rank) spatial bin per pixel
    order = jnp.argsort(p_int)
    rank = jnp.argsort(order)
    sbin = jnp.minimum(rank // _BIN_AREA, NUM_SPATIAL_BINS - 1)

    # permutation (Lehmer) index of the 4 sorted neighbour intensities
    perm = jnp.argsort(n_int, axis=-1).astype(jnp.int32)       # (P, 4)
    p0, p1, p2 = perm[:, 0], perm[:, 1], perm[:, 2]
    d1 = p1 - (p1 > p0)
    d2 = p2 - (p2 > p0).astype(jnp.int32) - (p2 > p1).astype(jnp.int32)
    perm_idx = (p0 * 3 + d1) * 2 + d2                          # (P,) in [0,24)

    # weight: #neighbour pairs differing by more than the threshold
    diffs = jnp.abs(n_int[:, :, None] - n_int[:, None, :])
    iu = jnp.triu_indices(NUM_NEIGHBOURS, k=1)
    w = jnp.sum((diffs[:, iu[0], iu[1]] > thr).astype(jnp.float32), -1)

    hist = jnp.zeros((LIOP_DIM,), jnp.float32).at[
        sbin * 24 + perm_idx].add(w)
    norm = jnp.maximum(jnp.linalg.norm(hist), 1e-12)
    return hist / norm


def warp_patches(img, xy, size, angle, kp_size_factor: float = 8.0):
    """Extract 41x41 patches (bilinear, zero border) for all keypoints.

    img: (H, W); xy: (K, 2); size: (K,) diameter; angle: (K,) radians.
    Warp parity with src/Regard3DFeatures.cpp:772-803 (see module doc)."""
    H, W = img.shape
    scale = size / PATCH_SIZE * kp_size_factor                 # (K,)
    theta = -jnp.pi - angle
    ca = scale * jnp.cos(theta)
    sa = scale * jnp.sin(theta)
    u = jnp.arange(PATCH_SIZE, dtype=img.dtype) - PATCH_RESOLUTION
    uu, vv = jnp.meshgrid(u, u, indexing="xy")                 # (41, 41)
    # src = kp + [[ca, sa], [-sa, ca]] @ [u, v]
    sx = xy[:, 0, None, None] + ca[:, None, None] * uu + sa[:, None, None] * vv
    sy = xy[:, 1, None, None] - sa[:, None, None] * uu + ca[:, None, None] * vv

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    # flat 1-D indexing: measurably faster than 2-D fancy indexing on TPU
    # (one gather dimension instead of two); results are identical
    flat = img.reshape(-1)

    def tap(xi, yi):
        ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.where(ok, flat[yi * W + xi], 0.0)

    val = ((1 - wx) * (1 - wy) * tap(x0, y0)
           + wx * (1 - wy) * tap(x0 + 1, y0)
           + (1 - wx) * wy * tap(x0, y0 + 1)
           + wx * wy * tap(x0 + 1, y0 + 1))
    return val                                                  # (K, 41, 41)


def describe_liop(img, kps: Keypoints, kp_size_factor: float = 8.0,
                  padded_dim: int = PADDED_DIM) -> Descriptors:
    """Descriptors for a batch of images. img: (B, H, W); kps: Keypoints with
    (B, K) fields. Returns Descriptors (B, K, padded_dim)."""

    def per_image(im, xy, size, angle, mask):
        patches = warp_patches(im, xy, size, angle, kp_size_factor)
        k = gaussian_kernel1d(PATCH_SMOOTH_SIGMA, 11)
        patches = conv_sep(patches, k, k)
        desc = jax.vmap(liop_from_patch)(patches)              # (K, 144)
        desc = desc * mask[:, None]
        pad = padded_dim - LIOP_DIM
        if pad > 0:
            desc = jnp.pad(desc, ((0, 0), (0, pad)))
        return desc

    data = jax.vmap(per_image)(img, kps.xy, kps.scale, kps.angle,
                               kps.mask.astype(img.dtype))
    return Descriptors(data=data, mask=kps.mask)
