"""Secondary keypoint detectors — GFTT, ORB (oFAST) and BRISK-style corners.

The reference exposes these through ``Regard3DFeatures::detectKeypoints``
(src/Regard3DFeatures.cpp:640-683) by delegating to OpenCV with default
parameters; keypoints are then re-described with LIOP using the per-detector
``kpSizeFactor`` table (src/Regard3DFeatures.cpp:691-717).  The TPU-native
rebuild expresses each detector as batched, statically-shaped JAX image ops:

* ``detect_gftt``  — Shi–Tomasi min-eigenvalue corners
  (cv::GFTTDetector::create(nFeatures) parity: qualityLevel=0.01,
  minDistance=1, blockSize=3, Sobel aperture 3).
* ``detect_orb``   — oFAST: FAST-9/16 segment test per pyramid level
  (threshold 20, 8 levels, scale 1.2), Harris ranking (k=0.04, block 7),
  intensity-centroid orientation (radius-15 disc) —
  cv::ORB::create(nFeatures) parity.
* ``detect_brisk`` — scale-space segment-test corners
  (cv::BRISK::create() parity: threshold 30, 3 octaves + intra-octaves at
  x1.5; AGAST/OAST 9-16 is a decision-tree *implementation* of the same
  segment-test criterion as FAST 9-16, so the vectorized test below computes
  the identical corner set; cross-layer maximum suppression + spatial NMS).

Angle convention: the internal ``Keypoints.angle`` is defined so that the
LIOP patch warp (kernels/liop.py: theta = -pi - angle) reproduces the
reference's ``-90deg - cv_angle_deg`` rotation for OpenCV-sourced keypoints
(src/Regard3DFeatures.cpp:790-803), i.e. ``angle = cv_angle_rad - pi/2``.
Detectors that leave the OpenCV angle undefined (GFTT, BRISK: -1 deg) store
the same constant mapped through that formula.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Keypoints

# cv::KeyPoint angle of -1 deg (undefined), in the internal convention
CV_UNDEFINED_ANGLE = -1.0 * math.pi / 180.0 - math.pi / 2.0


def _cv_angle_to_internal(angle_rad):
    return angle_rad - jnp.pi / 2.0


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

def _sobel(img):
    """3x3 Sobel derivatives on (B, H, W) with replicate-ish borders."""
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    dx = (p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) * 2.0 \
        + (p[:, :-2, 2:] - p[:, :-2, :-2]) \
        + (p[:, 2:, 2:] - p[:, 2:, :-2])
    dy = (p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) * 2.0 \
        + (p[:, 2:, :-2] - p[:, :-2, :-2]) \
        + (p[:, 2:, 2:] - p[:, :-2, 2:])
    return dx, dy


def _box(img, k: int):
    """k x k box sum via reduce_window (zero padding)."""
    r = k // 2
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, k, k), (1, 1, 1),
        [(0, 0), (r, r), (r, r)])


def _nms3x3_mask(r):
    neigh = jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])
    return r >= neigh


def _valid_area(shape, widths, heights, border: int):
    """(B, H, W) bool mask of pixels inside each image's true extent minus a
    border (batch padding + detector border exclusion)."""
    B, H, W = shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    w = widths.astype(jnp.int32)[:, None, None]
    h = heights.astype(jnp.int32)[:, None, None]
    return ((xs >= border) & (xs < w - border)
            & (ys >= border) & (ys < h - border))


def _topk_points(score, k: int):
    """Per-image top-k of a (B, H, W) score map.  Returns (x, y, val, valid)
    each (B, k); valid where val > 0."""
    B, H, W = score.shape
    flat = score.reshape(B, H * W)
    vals, idx = jax.lax.top_k(flat, k)
    return (idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32), \
        vals, vals > 0.0


# ---------------------------------------------------------------------------
# GFTT (Shi–Tomasi "good features to track")
# ---------------------------------------------------------------------------

def min_eig_response(img):
    """Min eigenvalue of the 3x3-windowed structure tensor
    (cv::cornerMinEigenVal parity up to a constant scale — GFTT thresholds
    relative to the per-image max, so absolute scale cancels)."""
    dx, dy = _sobel(img)
    a = _box(dx * dx, 3) * 0.5
    b = _box(dx * dy, 3)
    c = _box(dy * dy, 3) * 0.5
    return (a + c) - jnp.sqrt((a - c) * (a - c) + b * b)


def detect_gftt(img, widths=None, heights=None, max_keypoints: int = 4096,
                quality_level: float = 0.01) -> Keypoints:
    """Shi–Tomasi corners. img: (B, H, W) float in [0,1].

    Parity: cv::GFTTDetector defaults (src/Regard3DFeatures.cpp:672-676);
    keypoint size = blockSize = 3, angle undefined."""
    B, H, W = img.shape
    if widths is None:
        widths = jnp.full((B,), W, jnp.int32)
    if heights is None:
        heights = jnp.full((B,), H, jnp.int32)
    r = min_eig_response(img)
    area = _valid_area(img.shape, widths, heights, 1)
    r = jnp.where(area, r, 0.0)
    rmax = jnp.max(r.reshape(B, -1), axis=1)
    thr = (quality_level * rmax)[:, None, None]
    score = jnp.where(_nms3x3_mask(r) & (r > thr) & (r > 0), r, 0.0)
    x, y, vals, ok = _topk_points(score, min(max_keypoints, H * W))
    K = x.shape[1]
    return Keypoints(
        xy=jnp.stack([x, y], -1),
        scale=jnp.full((B, K), 3.0),
        angle=jnp.full((B, K), CV_UNDEFINED_ANGLE),
        score=jnp.where(ok, vals, 0.0),
        mask=ok)


# ---------------------------------------------------------------------------
# FAST segment test (shared by ORB and BRISK layers)
# ---------------------------------------------------------------------------

# Bresenham circle of radius 3, clockwise from 12 o'clock (OpenCV fast.cpp)
FAST_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)                                    # (16, 2) as (dx, dy)


def _circle_neighbours(img):
    """Stack the 16 FAST circle neighbours: (B, H, W) -> (16, B, H, W)."""
    p = jnp.pad(img, ((0, 0), (3, 3), (3, 3)), mode="edge")
    H, W = img.shape[1:]
    outs = []
    for dx, dy in FAST_CIRCLE:
        outs.append(jax.lax.dynamic_slice(
            p, (0, 3 + int(dy), 3 + int(dx)), (img.shape[0], H, W)))
    return jnp.stack(outs, 0)


def _run9_any(m):
    """m: (16, ...) bool circle masks -> any 9-contiguous (circular) run."""
    def roll(a, s):
        return jnp.roll(a, -s, axis=0)
    a2 = m & roll(m, 1)
    a4 = a2 & roll(a2, 2)
    a8 = a4 & roll(a4, 4)          # 8-runs starting at each position
    a9 = a8 & roll(m, 8)           # extend to 9
    return jnp.any(a9, axis=0)


def _arcmin9_max(d):
    """d: (16, ...) float.  max over the 16 circular arcs of the min of 9
    consecutive values — the exact FAST corner score for one polarity
    (score = max threshold at which the segment test still passes)."""
    def roll(a, s):
        return jnp.roll(a, -s, axis=0)
    a2 = jnp.minimum(d, roll(d, 1))
    a4 = jnp.minimum(a2, roll(a2, 2))
    a8 = jnp.minimum(a4, roll(a4, 4))
    a9 = jnp.minimum(a8, roll(d, 8))
    return jnp.max(a9, axis=0)


def fast_score(img, threshold: float):
    """FAST-9/16 segment test on (B, H, W).  Returns the per-pixel corner
    score (0 where not a corner): score = max t for which the test passes
    (cv::FAST score parity, scaled to the input's float range)."""
    neigh = _circle_neighbours(img)
    diff = neigh - img[None]
    bright = _arcmin9_max(diff)            # max-min over arcs of (p_i - p)
    dark = _arcmin9_max(-diff)
    score = jnp.maximum(bright, dark)
    return jnp.where(score > threshold, score, 0.0)


def harris_response(img, block: int = 7, k: float = 0.04):
    """Harris cornerness (cv::ORB HarrisResponses parity: Sobel derivatives,
    7x7 block sums, k=0.04)."""
    dx, dy = _sobel(img)
    a = _box(dx * dx, block)
    b = _box(dx * dy, block)
    c = _box(dy * dy, block)
    return a * c - b * b - k * (a + c) * (a + c)


# intensity-centroid disc: per-row max |x| for radius 15 (cv::ORB u_max)
_IC_RADIUS = 15


def _ic_offsets():
    offs = []
    r2 = _IC_RADIUS * _IC_RADIUS
    for y in range(-_IC_RADIUS, _IC_RADIUS + 1):
        for x in range(-_IC_RADIUS, _IC_RADIUS + 1):
            if x * x + y * y <= r2:
                offs.append((x, y))
    return np.asarray(offs, np.int32)


_IC_OFFS = _ic_offsets()


def ic_angle(img, x, y, valid):
    """Intensity-centroid orientation (cv::IC_Angle parity) at integer
    keypoint locations. img: (H, W); x, y: (K,) float. Returns radians."""
    H, W = img.shape
    ox = jnp.asarray(_IC_OFFS[:, 0])
    oy = jnp.asarray(_IC_OFFS[:, 1])
    ix = jnp.clip(x[:, None].astype(jnp.int32) + ox[None], 0, W - 1)
    iy = jnp.clip(y[:, None].astype(jnp.int32) + oy[None], 0, H - 1)
    v = img[iy, ix]                                    # (K, P)
    m10 = jnp.sum(v * ox[None].astype(img.dtype), -1)
    m01 = jnp.sum(v * oy[None].astype(img.dtype), -1)
    ang = jnp.arctan2(m01, m10)
    return jnp.where(valid, ang, 0.0)


def _resize_bilinear(img, new_h: int, new_w: int):
    """(B, H, W) bilinear resize (align-corners=False, cv INTER_LINEAR)."""
    B, H, W = img.shape
    return jax.image.resize(img, (B, new_h, new_w), method="linear")


def orb_levels_distribution(n_features: int, n_levels: int,
                            scale_factor: float) -> List[int]:
    """Per-level feature budget (cv::ORB computeKeyPoints parity)."""
    factor = 1.0 / scale_factor
    ndesired = n_features * (1.0 - factor) / (1.0 - factor ** n_levels)
    counts = []
    total = 0
    for _ in range(n_levels - 1):
        c = int(round(ndesired))
        counts.append(c)
        total += c
        ndesired *= factor
    counts.append(max(n_features - total, 0))
    return counts


def detect_orb(img, widths=None, heights=None, max_keypoints: int = 4096,
               n_levels: int = 8, scale_factor: float = 1.2,
               fast_threshold: float = 20.0 / 255.0,
               edge_threshold: int = 31) -> Keypoints:
    """oFAST detector (cv::ORB::create(nFeatures) parity; the MLDB/BRIEF
    descriptor half is unused in the reference — LIOP re-describes, with
    kpSizeFactor 0.025).

    img: (B, H, W) float in [0,1].  Keypoint size = 31 * 1.2^level; angle
    from the intensity centroid."""
    B, H, W = img.shape
    if widths is None:
        widths = jnp.full((B,), W, jnp.int32)
    if heights is None:
        heights = jnp.full((B,), H, jnp.int32)
    budgets = orb_levels_distribution(max_keypoints, n_levels, scale_factor)

    xs, ys, sizes, angles, scores, valids = ([] for _ in range(6))
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        lh, lw = max(int(round(H / s)), 32), max(int(round(W / s)), 32)
        lim = _resize_bilinear(img, lh, lw) if lvl else img
        lws = jnp.maximum((widths.astype(jnp.float32) / s), 32.0)
        lhs = jnp.maximum((heights.astype(jnp.float32) / s), 32.0)

        fscore = fast_score(lim, fast_threshold)
        # border: ORB removes keypoints within edgeThreshold of the level edge
        area = _valid_area(lim.shape, lws, lhs, edge_threshold)
        fscore = jnp.where(area & _nms3x3_mask(fscore), fscore, 0.0)
        # rank survivors by Harris response (HARRIS_SCORE default), shifted
        # positive so _topk_points' "val > 0 is live" convention holds
        harris = harris_response(lim)
        cand = fscore > 0
        hmin = jnp.min(jnp.where(cand, harris, jnp.inf), axis=(1, 2),
                       keepdims=True)
        hmin = jnp.where(jnp.isfinite(hmin), hmin, 0.0)
        rank = jnp.where(cand, harris - hmin + 1e-6, 0.0)
        k = min(max(budgets[lvl], 1), lh * lw)
        x, y, hval, ok = _topk_points(rank, k)

        ang = jax.vmap(ic_angle)(lim, x, y, ok)
        xs.append(x * s)
        ys.append(y * s)
        sizes.append(jnp.full_like(x, 31.0 * s))
        angles.append(_cv_angle_to_internal(ang))
        scores.append(jnp.where(ok, hval, 0.0))
        valids.append(ok)

    x = jnp.concatenate(xs, 1)
    y = jnp.concatenate(ys, 1)
    size = jnp.concatenate(sizes, 1)
    angle = jnp.concatenate(angles, 1)
    score = jnp.concatenate(scores, 1)
    valid = jnp.concatenate(valids, 1)
    # global top-K by score, capacity max_keypoints
    k = min(max_keypoints, score.shape[1])
    svals, order = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), k)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    ok = jnp.isfinite(svals) & take(valid)
    return Keypoints(xy=jnp.stack([take(x), take(y)], -1),
                     scale=take(size), angle=take(angle),
                     score=jnp.where(ok, take(score), 0.0), mask=ok)


# ---------------------------------------------------------------------------
# BRISK-style scale-space segment-test corners
# ---------------------------------------------------------------------------

def detect_brisk(img, widths=None, heights=None, max_keypoints: int = 4096,
                 threshold: float = 30.0 / 255.0, octaves: int = 3,
                 basic_size: float = 12.0) -> Keypoints:
    """Scale-space corners in the BRISK layer layout
    (cv::BRISK::create() defaults: thresh=30, octaves=3; layers c_i at scale
    2^i and intra-octaves d_i at 1.5*2^i, BriskScaleSpace parity).  The
    per-layer corner criterion is the 9-of-16 segment test (identical corner
    set to the AGAST/OAST 9-16 decision tree the CPU implementation uses);
    a corner must be a spatial 3x3 maximum and beat both neighbouring layers
    (cross-scale suppression).  Keypoint size = 12 * layer scale; angle
    undefined at detection (kpSizeFactor 0.15 feeds LIOP)."""
    B, H, W = img.shape
    if widths is None:
        widths = jnp.full((B,), W, jnp.int32)
    if heights is None:
        heights = jnp.full((B,), H, jnp.int32)

    # layer scales: c0, d0, c1, d1, ... (2^i and 1.5*2^i)
    layer_scales = []
    for i in range(octaves):
        layer_scales.append(2.0 ** i)
        layer_scales.append(1.5 * 2.0 ** i)

    smaps, sizes_hw = [], []
    for s in layer_scales:
        lh, lw = max(int(round(H / s)), 16), max(int(round(W / s)), 16)
        lim = _resize_bilinear(img, lh, lw) if s != 1.0 else img
        lws = jnp.maximum(widths.astype(jnp.float32) / s, 16.0)
        lhs = jnp.maximum(heights.astype(jnp.float32) / s, 16.0)
        sc = fast_score(lim, threshold)
        area = _valid_area(lim.shape, lws, lhs, 4)
        smaps.append(jnp.where(area, sc, 0.0))
        sizes_hw.append((lh, lw))

    per_layer = max(max_keypoints // len(layer_scales), 64)
    xs, ys, sizes, scores, valids = ([] for _ in range(5))
    for li, s in enumerate(layer_scales):
        sc = smaps[li]
        cand = jnp.where(_nms3x3_mask(sc), sc, 0.0)
        # cross-layer suppression: resample neighbour layers to this one and
        # require the candidate to be >= their local max
        lh, lw = sizes_hw[li]
        rival = cand
        for lj in (li - 1, li + 1):
            if lj < 0 or lj >= len(layer_scales):
                continue
            other = _resize_bilinear(smaps[lj], lh, lw)
            rival = jnp.maximum(
                rival, jax.lax.reduce_window(
                    other, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
                    [(0, 0), (1, 1), (1, 1)]))
        keep = jnp.where((cand > 0) & (cand >= rival), cand, 0.0)
        x, y, vals, ok = _topk_points(keep, min(per_layer, lh * lw))
        xs.append(x * s)
        ys.append(y * s)
        sizes.append(jnp.full_like(x, basic_size * s))
        scores.append(jnp.where(ok, vals, 0.0))
        valids.append(ok)

    x = jnp.concatenate(xs, 1)
    y = jnp.concatenate(ys, 1)
    size = jnp.concatenate(sizes, 1)
    score = jnp.concatenate(scores, 1)
    valid = jnp.concatenate(valids, 1)
    k = min(max_keypoints, score.shape[1])
    svals, order = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), k)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    ok = jnp.isfinite(svals) & take(valid)
    return Keypoints(xy=jnp.stack([take(x), take(y)], -1),
                     scale=take(size),
                     angle=jnp.full((B, k), CV_UNDEFINED_ANGLE),
                     score=jnp.where(ok, take(score), 0.0), mask=ok)
