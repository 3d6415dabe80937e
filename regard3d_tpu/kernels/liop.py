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


def liop_from_patches(patches):
    """Batched LIOP descriptors. patches: (K, 41, 41) -> (K, 144).

    TPU formulation: the per-pixel rank order becomes one ``jnp.sort`` +
    five quantile-threshold comparisons (instead of a double argsort), the
    4-neighbour permutation index comes from stable pairwise-comparison
    ranks (no tiny sorts), and the 144-bin histogram is an einsum over
    spatial-bin/permutation one-hots (no scatter-add) — sorts and scatters
    were the expensive lowering on TPU, comparisons and matmuls are not.
    Bin assignment is identical to the rank/argsort formulation except for
    exact intensity ties at bin boundaries (implementation-defined in the
    reference too; see test_liop golden notes)."""
    K = patches.shape[0]
    flat = patches.reshape(K, -1)
    p_int = flat[:, jnp.asarray(_PX + _PY * PATCH_SIZE)]       # (K, P)
    # neighbour intensities via static bilinear taps: (K, P, 4)
    n_int = jnp.sum(flat[:, jnp.asarray(_TAPS_IDX)]
                    * jnp.asarray(_TAPS_W), -1)

    # adaptive threshold from patch extrema (over circular pixels)
    thr = INTENSITY_THRESHOLD * (jnp.max(p_int, 1) - jnp.min(p_int, 1))

    # ordinal spatial bin: rank // area == number of bin-boundary order
    # statistics strictly below the value (ties at a boundary collapse to
    # the lower bin; rank order elsewhere identical)
    srt = jnp.sort(p_int, axis=1)
    bounds = srt[:, [t * _BIN_AREA - 1
                     for t in range(1, NUM_SPATIAL_BINS)]]    # (K, 5)
    sbin = jnp.sum(p_int[:, :, None] > bounds[:, None, :],
                   axis=-1).astype(jnp.int32)                  # (K, P)

    # permutation (Lehmer) index from stable comparison ranks (ties by
    # original index — matches jnp.argsort's stable order)
    ai = n_int[..., :, None]                                   # n_i
    aj = n_int[..., None, :]                                   # n_j
    jlti = (jnp.arange(4)[None, :] < jnp.arange(4)[:, None])   # [i, j]: j<i
    r = jnp.sum((aj < ai) | ((aj == ai) & jlti),
                axis=-1).astype(jnp.int32)                     # (K, P, 4)
    ii = jnp.arange(4, dtype=jnp.int32)
    p0 = jnp.sum(ii * (r == 0), -1)
    p1 = jnp.sum(ii * (r == 1), -1)
    p2 = jnp.sum(ii * (r == 2), -1)
    d1 = p1 - (p1 > p0)
    d2 = p2 - (p2 > p0).astype(jnp.int32) - (p2 > p1).astype(jnp.int32)
    perm_idx = (p0 * 3 + d1) * 2 + d2                          # (K, P)

    # weight: #neighbour pairs differing by more than the threshold
    diffs = jnp.abs(n_int[:, :, :, None] - n_int[:, :, None, :])
    iu = jnp.triu_indices(NUM_NEIGHBOURS, k=1)
    w = jnp.sum((diffs[:, :, iu[0], iu[1]]
                 > thr[:, None, None]).astype(jnp.float32), -1)  # (K, P)

    # histogram as one-hot einsum: hist[s, q] = sum_p w_p [sbin=s][perm=q]
    oh_s = ((sbin[..., None] == jnp.arange(NUM_SPATIAL_BINS))
            .astype(jnp.bfloat16) * w[..., None].astype(jnp.bfloat16))
    oh_q = (perm_idx[..., None] == jnp.arange(24)).astype(jnp.bfloat16)
    hist = jnp.einsum("kps,kpq->ksq", oh_s, oh_q,
                      preferred_element_type=jnp.float32)
    hist = hist.reshape(K, LIOP_DIM)
    norm = jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), 1e-12)
    return hist / norm


def liop_from_patch(patch):
    """LIOP descriptor of one smoothed 41x41 patch -> (144,) float32."""
    return liop_from_patches(patch[None])[0]


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


_WIN = 128                  # pyramid-window side (static)
_MAX_STEP = 2.19            # max sampling step a window covers:
                            # 20*step*sqrt(2) + 1 <= _WIN/2 - 1


def _area_half(img):
    """2x2 area downsample of (H, W)."""
    H, W = img.shape
    return img[:H - H % 2, :W - W % 2].reshape(
        H // 2, 2, W // 2, 2).mean((1, 3))


def warp_patches_pyramid(imgs, img_id, xy, size, angle,
                         kp_size_factor: float = 8.0,
                         chunk: int = 1024, process_fn=None):
    """41x41 patch extraction for MANY keypoints across an image batch —
    the TPU fast path for ``warp_patches`` (same sampling contract).

    TPU rationale: per-tap bilinear gathers from the full image ran at
    ~0.08 taps/cycle (1.4 s for 16k keypoints); instead each keypoint
    reads ONE aligned (128, 128) window via a sliced gather from an image
    pyramid level chosen so its sampling step is <= ~2.2 px (the window
    then always covers the rotated patch), and the bilinear interpolation
    becomes a separable bilinear form: hat-weight matrices A (y) and B (x)
    contract the window on the MXU:  out[p] = sum_y A[p,y] (W B^T)[y,p].
    Keypoints with step <= 2.2 sample level 0 — bit-compatible with the
    direct warp up to matmul rounding; larger keypoints sample an
    area-downsampled level (anti-aliased, where the reference's full-res
    bilinear warp undersamples).

    imgs: (B, H, W); img_id: (N,) which image each keypoint reads;
    xy/size/angle: (N, ...) keypoint params. Returns (N, 41, 41)."""
    B, H, W = imgs.shape
    # pyramid levels stacked padded into (B, L, H, W); level l valid in
    # the top-left (H//2^l, W//2^l) corner
    L = 1
    while (min(H, W) >> L) >= _WIN and L < 5:
        L += 1
    levels = [imgs]
    for _ in range(1, L):
        levels.append(jax.vmap(_area_half)(levels[-1]))
    stack = jnp.zeros((B, L, H, W), imgs.dtype)
    for l, lv in enumerate(levels):
        stack = stack.at[:, l, :lv.shape[1], :lv.shape[2]].set(lv)

    N = xy.shape[0]
    scale = size / PATCH_SIZE * kp_size_factor                 # (N,)
    theta = -jnp.pi - angle
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(scale, 1e-6) / _MAX_STEP)),
                   0, L - 1).astype(jnp.int32)
    inv = jnp.exp2(-lvl.astype(imgs.dtype))
    # pixel-center mapping for area downsampling: x_l = (x+0.5)*2^-l - 0.5
    cx = (xy[:, 0] + 0.5) * inv - 0.5
    cy = (xy[:, 1] + 0.5) * inv - 0.5
    ca = scale * inv * jnp.cos(theta)
    sa = scale * inv * jnp.sin(theta)
    Wl = (W * inv).astype(jnp.int32)
    Hl = (H * inv).astype(jnp.int32)
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - _WIN // 2, 0,
                  jnp.maximum(Wl - _WIN, 0))
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - _WIN // 2, 0,
                  jnp.maximum(Hl - _WIN, 0))

    u = jnp.arange(PATCH_SIZE, dtype=imgs.dtype) - PATCH_RESOLUTION
    uu, vv = jnp.meshgrid(u, u, indexing="xy")                 # (41, 41)
    uu = uu.reshape(-1)
    vv = vv.reshape(-1)                                        # (1681,)

    chunk = min(chunk, max(N, 1))
    n_chunks = -(-N // chunk)
    Npad = n_chunks * chunk
    if Npad != N:   # pad params so every chunk is full (extras discarded)
        padn = Npad - N
        img_id = jnp.pad(img_id, (0, padn))
        cx = jnp.pad(cx, (0, padn))
        cy = jnp.pad(cy, (0, padn))
        ca = jnp.pad(ca, (0, padn))
        sa = jnp.pad(sa, (0, padn))
        x0 = jnp.pad(x0, (0, padn))
        y0 = jnp.pad(y0, (0, padn))
        lvl = jnp.pad(lvl, (0, padn))
        Wl = jnp.pad(Wl, (0, padn), constant_values=_WIN)
        Hl = jnp.pad(Hl, (0, padn), constant_values=_WIN)

    def one_chunk(sl):
        cid = jax.lax.dynamic_slice_in_dim(jnp.arange(Npad), sl * chunk,
                                           chunk)
        g = lambda a: a[cid]
        # window gather: one (1,1,WIN,WIN) slice per keypoint
        starts = jnp.stack([g(img_id), g(lvl), g(y0), g(x0)], -1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1, 2, 3))
        win = jax.lax.gather(stack, starts, dn,
                             slice_sizes=(1, 1, _WIN, _WIN),
                             mode=jax.lax.GatherScatterMode.CLIP)
        # sample positions in window coords: (chunk, 1681)
        sx = (g(cx) - g(x0).astype(imgs.dtype))[:, None] \
            + g(ca)[:, None] * uu + g(sa)[:, None] * vv
        sy = (g(cy) - g(y0).astype(imgs.dtype))[:, None] \
            - g(sa)[:, None] * uu + g(ca)[:, None] * vv
        # samples beyond the level image edge must read 0 even where the
        # CLIP-ed window would alias them back inside
        wl = g(Wl).astype(imgs.dtype)[:, None]
        hl = g(Hl).astype(imgs.dtype)[:, None]
        sxi = (g(cx))[:, None] + g(ca)[:, None] * uu + g(sa)[:, None] * vv
        syi = (g(cy))[:, None] - g(sa)[:, None] * uu + g(ca)[:, None] * vv
        inside = ((sxi > -1.0) & (sxi < wl) & (syi > -1.0) & (syi < hl))
        iota = jnp.arange(_WIN, dtype=imgs.dtype)
        A = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - iota))
        Bm = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - iota))
        M = jnp.einsum("kpx,kyx->kpy", Bm, win,
                       preferred_element_type=jnp.float32)
        out = jnp.sum(A * M, -1) * inside
        patches = out.reshape(chunk, PATCH_SIZE, PATCH_SIZE)
        # fusing downstream per-patch work into the chunk loop keeps the
        # intermediate patch tensors VMEM/cache-sized and every descriptor
        # op at a fixed small batch (XLA compiles one chunk shape)
        return patches if process_fn is None else process_fn(patches)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return out.reshape((Npad,) + out.shape[2:])[:N]


def describe_liop(img, kps: Keypoints, kp_size_factor: float = 8.0,
                  padded_dim: int = PADDED_DIM,
                  use_pyramid=None) -> Descriptors:
    """Descriptors for a batch of images. img: (B, H, W); kps: Keypoints with
    (B, K) fields. Returns Descriptors (B, K, padded_dim).

    ``use_pyramid`` selects the windowed pyramid warp (TPU default; see
    warp_patches_pyramid) vs the direct per-tap bilinear warp (CPU/tests
    default — exact reference parity)."""
    B, K = kps.scale.shape
    if use_pyramid is None:
        use_pyramid = jax.default_backend() == "tpu"

    k1 = gaussian_kernel1d(PATCH_SMOOTH_SIGMA, 11)

    if use_pyramid:
        img_id = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)

        def proc(patches):
            patches = conv_sep(patches, k1, k1, use_matmul=False)
            return liop_from_patches(patches)

        desc = warp_patches_pyramid(
            img, img_id, kps.xy.reshape(B * K, 2),
            kps.scale.reshape(-1), kps.angle.reshape(-1), kp_size_factor,
            process_fn=proc)
        desc = desc.reshape(B, K, LIOP_DIM)
        desc = desc * kps.mask.astype(img.dtype)[..., None]
        pad = padded_dim - LIOP_DIM
        if pad > 0:
            desc = jnp.pad(desc, ((0, 0), (0, 0), (0, pad)))
        return Descriptors(data=desc, mask=kps.mask)

    def per_image(im, xy, size, angle, mask):
        patches = warp_patches(im, xy, size, angle, kp_size_factor)
        patches = conv_sep(patches, k1, k1, use_matmul=False)
        desc = liop_from_patches(patches)                      # (K, 144)
        desc = desc * mask[:, None]
        pad = padded_dim - LIOP_DIM
        if pad > 0:
            desc = jnp.pad(desc, ((0, 0), (0, pad)))
        return desc

    data = jax.vmap(per_image)(img, kps.xy, kps.scale, kps.angle,
                               kps.mask.astype(img.dtype))
    return Descriptors(data=data, mask=kps.mask)
