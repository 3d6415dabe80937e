"""AKAZE feature detection on the nonlinear scale space.

Rebuilds the detection half of the vendored AKAZE
(`/root/reference/src/thirdparty/akaze/lib/AKAZE.cpp:195-260` det-Hessian,
`:273-460` extrema + subpixel) with TPU-friendly, statically-shaped ops:

* determinant-of-Hessian responses from scaled Scharr derivatives;
* 3x3 strict NMS + threshold per level (vectorized over batch & levels);
* the reference's greedy keypoint-list cross-scale suppression (radius =
  point size, adjacent class ids) becomes a windowed max over
  candidate-masked response maps of the neighbouring levels — same
  radius rule, order-free;
* keypoints are extracted per octave with a static capacity via `top_k`
  (the padded-batch replacement for dynamic keypoint vectors), then
  subpixel-refined (spatial 3x3 quadratic, AKAZE :401-447) and oriented
  (gauss25-weighted 109-sample disc + pi/3 sliding window, AKAZE
  Compute_Main_Orientation).

Output contract matches the reference detector
(cv::KeyPoint: x, y, size = diameter, angle; size doubles after subpixel,
AKAZE.cpp:444).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.core.types import Keypoints
from regard3d_tpu.kernels import scale_space as ss

# gauss25 weight table (AKAZEConfig.h:38-46)
GAUSS25 = np.array([
    [0.02546481, 0.02350698, 0.01849125, 0.01239505, 0.00708017, 0.00344629, 0.00142946],
    [0.02350698, 0.02169968, 0.01706957, 0.01144208, 0.00653582, 0.00318132, 0.00131956],
    [0.01849125, 0.01706957, 0.01342740, 0.00900066, 0.00514126, 0.00250252, 0.00103800],
    [0.01239505, 0.01144208, 0.00900066, 0.00603332, 0.00344629, 0.00167749, 0.00069579],
    [0.00708017, 0.00653582, 0.00514126, 0.00344629, 0.00196855, 0.00095820, 0.00039744],
    [0.00344629, 0.00318132, 0.00250252, 0.00167749, 0.00095820, 0.00046640, 0.00019346],
    [0.00142946, 0.00131956, 0.00103800, 0.00069579, 0.00039744, 0.00019346, 0.00008024],
], np.float32)

SMAX_MLDB = 10.0 * math.sqrt(2.0)   # descriptor-border margin (AKAZE:289)


def det_hessian(levels: List[ss.Evolution]):
    """Per-level determinant-of-Hessian responses + the (scaled) first
    derivatives needed later for orientation.

    Returns (ldet: list[(B,H,W)], lx: list, ly: list)."""
    ldets, lxs, lys = [], [], []
    for lv in levels:
        m = lv.meta
        s = max(m.sigma_size, 1)
        lx = ss.scharr(lv.Lsmooth, 1, 0, s)
        ly = ss.scharr(lv.Lsmooth, 0, 1, s)
        lxx = ss.scharr(lx, 1, 0, s)
        lxy = ss.scharr(lx, 0, 1, s)
        lyy = ss.scharr(ly, 0, 1, s)
        s2 = float(s * s)
        ldet = (lxx * lyy - lxy * lxy) * (s2 * s2)
        ldets.append(ldet)
        lxs.append(lx * float(s))
        lys.append(ly * float(s))
    return ldets, lxs, lys


def _nms3x3(r, threshold: float, min_threshold: float):
    """Strict 3x3 local max above threshold; border excluded. r: (B,H,W).

    AKAZE requires the response to be *strictly* greater than all 8
    neighbours (akaze/lib/AKAZE.h Find_Scale_Space_Extrema uses ``>``), so
    plateau ties suppress each other; the centre-excluded neighbour max is
    formed from 8 shifted slices of a -inf-padded response map."""
    B, H, W = r.shape
    p = jnp.pad(r, ((0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    nmax = None
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            s = p[:, dy:dy + H, dx:dx + W]
            nmax = s if nmax is None else jnp.maximum(nmax, s)
    is_max = r > nmax
    thr = (r > threshold) & (r >= min_threshold)
    mask = is_max & thr
    # exclude 1px border (reference loops 1..rows-1)
    border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    return mask & border[None]


def _window_max(r, radius: int):
    if radius <= 0:
        return r
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (radius, radius), (radius, radius)])


def _row_max(r, lo: int, hi: int):
    """Horizontal running max over dx in [lo, hi] (inclusive). r: (B,H,W):
    out[x] = max_{d in [lo,hi]} r[x+d] (reduce_window padding (-lo, hi)
    places the window so offset 0 is the element itself)."""
    if lo > hi:
        return jnp.full_like(r, -jnp.inf)
    k = hi - lo + 1
    return jax.lax.reduce_window(
        r, -jnp.inf, jax.lax.max, (1, 1, k), (1, 1, 1),
        [(0, 0), (0, 0), (-lo, hi)])


def _shift_rows(r, dy: int):
    """Shift rows so out[y] = r[y+dy], -inf fill."""
    if dy == 0:
        return r
    B, H, W = r.shape
    pad = jnp.full((B, abs(dy), W), -jnp.inf, r.dtype)
    if dy > 0:
        return jnp.concatenate([r[:, dy:], pad], axis=1)
    return jnp.concatenate([pad, r[:, :dy]], axis=1)


def _circular_max(r, radius: float):
    """Max over a CIRCULAR disc of offsets (dy,dx), dy^2+dx^2 <= radius^2 —
    the reference's suppression footprint is the euclidean ball
    ``dist <= point.size^2`` (AKAZE.cpp:308-312), not a square window."""
    R = int(math.floor(radius))
    out = None
    for dy in range(-R, R + 1):
        rem = radius * radius - dy * dy
        if rem < 0:
            continue
        kx = int(math.floor(math.sqrt(rem)))
        row = _row_max(r, -kx, kx)
        row = _shift_rows(row, dy)
        out = row if out is None else jnp.maximum(out, row)
    if out is None:
        out = jnp.full_like(r, -jnp.inf)
    return out


def _upsample2_nearest(r):
    return jnp.repeat(jnp.repeat(r, 2, axis=1), 2, axis=2)


def _downsample2_max(r):
    B, H, W = r.shape
    return r.reshape(B, H // 2, 2, W // 2, 2).max((2, 4))


def find_extrema(levels: List[ss.Evolution], ldets,
                 cfg: ss.ScaleSpaceConfig):
    """Scale-space extrema with cross-level suppression.

    Vectorized restatement of the reference's greedy keypoint-list duels
    (AKAZE.cpp:273-385): a candidate at class i is dropped iff
      * an EARLIER-scanned same-class candidate within the circular radius
        beats-or-ties it (pass 1, ties favor the list point, :314-318) —
        modeled by the self-inclusive FULL-disc max (the greedy replacement
        chain converges to the disc max; scan order is not modeled);
      * a class i-1 candidate within radius beats-or-ties it (pass 1; all
        lower-class points precede it in the list);
      * a class i+1 candidate within radius STRICTLY beats it (pass 2,
        :361-380, `<` comparison).
    The footprint is the euclidean disc dist <= size (original-image px),
    i.e. radius size/ratio in level pixels — NOT a square window.  The
    break-on-first-neighbour leniency and replacement-removal dynamics of
    the greedy list are order-dependent and not modeled; the golden gate
    (tests/test_akaze_golden.py) bounds the statistical deviation.

    Returns per-level boolean masks of surviving candidates."""
    nlev = len(levels)
    # candidate response maps (masked NMS)
    cand = []
    for lv, ldet in zip(levels, ldets):
        m = _nms3x3(ldet, cfg.dthreshold, cfg.min_dthreshold)
        cand.append(jnp.where(m, ldet, 0.0))

    def radius_of(i):
        m = levels[i].meta
        return max(m.esigma * cfg.derivative_factor / m.ratio, 1.0)

    def align(src_i, dst_i, r):
        """Resample level src_i's map onto level dst_i's grid."""
        if levels[src_i].meta.octave < levels[dst_i].meta.octave:
            return _downsample2_max(r)
        if levels[src_i].meta.octave > levels[dst_i].meta.octave:
            return _upsample2_nearest(r)
        return r

    # Pass 1, levels ascending — the duel partner is the SURVIVOR map of
    # the previous class, not its raw candidates: a class-(i-1) point that
    # was itself replaced is gone from kpts_aux and cannot suppress.  This
    # reproduces the greedy list's class-parity dynamics (a persistent
    # corner collapses classes i-1/i to the stronger one, and class i+1
    # then duels only the survivor).
    surv = [None] * nlev
    for i in range(nlev):
        me = cand[i]
        r_i = radius_of(i)
        ok = me > 0
        # same-class: survivor of the disc duel (self-inclusive max; the
        # greedy replacement chain converges to the disc max)
        ok = ok & (me >= _circular_max(me, r_i))
        if i > 0:
            rival = _circular_max(align(i - 1, i, surv[i - 1]), r_i)
            ok = ok & ~(rival >= me)          # ties favor the list point
        surv[i] = jnp.where(ok, me, 0.0)
        if i > 0:
            # replacement-removal: an accepted class-i point REPLACES any
            # weaker class-(i-1) survivor within its radius (AKAZE.cpp
            # :314-316, kpts_aux[id_repeated] = point)
            m_lo = levels[i - 1].meta
            r_on_lower = max(levels[i].meta.esigma * cfg.derivative_factor
                             / m_lo.ratio, 1.0)
            beat = _circular_max(align(i, i - 1, surv[i]), r_on_lower)
            surv[i - 1] = jnp.where(beat > surv[i - 1], 0.0, surv[i - 1])

    # Pass 2: drop a survivor iff a class-(i+1) survivor within radius is
    # STRICTLY stronger (AKAZE.cpp:361-380)
    keep_masks = []
    for i in range(nlev):
        me = surv[i]
        keep = me > 0
        if i + 1 < nlev:
            rival = _circular_max(align(i + 1, i, surv[i + 1]), radius_of(i))
            keep = keep & ~(rival > me)
        keep_masks.append(keep)
    return keep_masks


def _subpixel_maps(ldet):
    """Dense spatial subpixel offsets per pixel (AKAZE Do_Subpixel_Refinement:
    2D quadratic fit on the 3x3 response neighbourhood).
    Returns (dx, dy, ok) maps."""
    r = jnp.pad(ldet, ((0, 0), (1, 1), (1, 1)), mode="edge")
    c = r[:, 1:-1, 1:-1]
    xm = r[:, 1:-1, :-2]; xp = r[:, 1:-1, 2:]
    ym = r[:, :-2, 1:-1]; yp = r[:, 2:, 1:-1]
    xmym = r[:, :-2, :-2]; xpym = r[:, :-2, 2:]
    xmyp = r[:, 2:, :-2]; xpyp = r[:, 2:, 2:]
    gx = 0.5 * (xp - xm)
    gy = 0.5 * (yp - ym)
    hxx = xp + xm - 2.0 * c
    hyy = yp + ym - 2.0 * c
    hxy = 0.25 * (xpyp - xpym - xmyp + xmym)
    det = hxx * hyy - hxy * hxy
    safe = jnp.abs(det) > 1e-20
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    dx = -(hyy * gx - hxy * gy) * inv_det
    dy = -(hxx * gy - hxy * gx) * inv_det
    ok = safe & (jnp.abs(dx) <= 1.0) & (jnp.abs(dy) <= 1.0)
    return dx, dy, ok


def _orientation(kp_x, kp_y, kp_scale, lx, ly, kp_sub, valid):
    """Main orientation per keypoint (Compute_Main_Orientation parity).

    kp_x/kp_y: (B, K) level-frame coords; kp_scale: (B, K) int sampling step
    s = round(0.5*size/ratio); lx/ly: (B, S, H, W) stacked per-sublevel
    derivative maps; kp_sub: (B, K) sublevel index. Returns angles (B, K)."""
    B, S, H, W = lx.shape
    offs = [(i, j) for i in range(-6, 7) for j in range(-6, 7)
            if i * i + j * j < 36]
    oi = jnp.asarray([o[0] for o in offs], jnp.int32)        # (109,)
    oj = jnp.asarray([o[1] for o in offs], jnp.int32)
    idtab = np.array([6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 6])
    w = jnp.asarray(GAUSS25[idtab[[o[0] + 6 for o in offs]],
                            idtab[[o[1] + 6 for o in offs]]])  # (109,)

    # sample coords: ix = round(xf + i*s), iy = round(yf + j*s)
    ix = jnp.round(kp_x[..., None] + oi[None, None] * kp_scale[..., None])
    iy = jnp.round(kp_y[..., None] + oj[None, None] * kp_scale[..., None])
    ix = jnp.clip(ix, 0, W - 1).astype(jnp.int32)           # (B, K, 109)
    iy = jnp.clip(iy, 0, H - 1).astype(jnp.int32)

    def gather(maps, sub, iy, ix):
        # maps: (S, H, W); sub: (K,); iy/ix: (K, 109)
        flat = maps.reshape(S * H * W)
        idx = sub[:, None] * (H * W) + iy * W + ix
        return flat[idx]

    resx = jax.vmap(gather, in_axes=(0, 0, 0, 0))(lx, kp_sub, iy, ix) * w
    resy = jax.vmap(gather, in_axes=(0, 0, 0, 0))(ly, kp_sub, iy, ix) * w
    ang = jnp.arctan2(resy, resx)
    ang = jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)        # (B, K, 109)

    # 42 sliding windows of width pi/3, step 0.15 rad
    starts = jnp.arange(0.0, 2.0 * jnp.pi, 0.15, dtype=jnp.float32)
    ends = jnp.where(starts + jnp.pi / 3 > 2 * jnp.pi,
                     starts - 5.0 * jnp.pi / 3.0, starts + jnp.pi / 3.0)
    a = ang[..., None]                                       # (B, K, 109, 1)
    inside_fwd = (starts < ends) & (starts < a) & (a < ends)
    inside_wrap = (ends < starts) & (((a > 0) & (a < ends)) |
                                     ((a > starts) & (a < 2 * jnp.pi)))
    inside = inside_fwd | inside_wrap                        # (B, K, 109, 42)
    sx = jnp.sum(jnp.where(inside, resx[..., None], 0.0), axis=2)
    sy = jnp.sum(jnp.where(inside, resy[..., None], 0.0), axis=2)
    mag = sx * sx + sy * sy                                  # (B, K, 42)
    best = jnp.argmax(mag, axis=-1)
    bx = jnp.take_along_axis(sx, best[..., None], -1)[..., 0]
    by = jnp.take_along_axis(sy, best[..., None], -1)[..., 0]
    theta = jnp.arctan2(by, bx)
    theta = jnp.where(theta < 0, theta + 2.0 * jnp.pi, theta)
    return jnp.where(valid, theta, 0.0)


def detect(levels: List[ss.Evolution], cfg: ss.ScaleSpaceConfig,
           image_width, image_height, max_keypoints: int = 4096) -> Keypoints:
    """Full detection pass. image_width/height: (B,) true sizes (for border
    filtering of batch padding). Returns Keypoints (B, max_keypoints) in
    original image coordinates."""
    ldets, lxs, lys = det_hessian(levels)
    keeps = find_extrema(levels, ldets, cfg)

    B = ldets[0].shape[0]
    octaves = sorted({lv.meta.octave for lv in levels})
    # per-octave capacity = the full budget: detections concentrate in
    # octave 0 (fine scales), so splitting the budget across octaves
    # silently dropped ~2/3 of survivors vs the reference's unbounded
    # vectors; the global top-k below trims to max_keypoints
    per_oct = max_keypoints

    all_x, all_y, all_size, all_angle, all_resp, all_valid = ([] for _ in range(6))

    for o in octaves:
        lv_ids = [i for i, lv in enumerate(levels) if lv.meta.octave == o]
        S = len(lv_ids)
        ratio = float(1 << o)
        H, W = ldets[lv_ids[0]].shape[1:]
        resp = jnp.stack([jnp.where(keeps[i], ldets[i], 0.0) for i in lv_ids], 1)
        # (B, S, H, W) -> flat top-k per image
        flat = resp.reshape(B, S * H * W)
        vals, idx = jax.lax.top_k(flat, per_oct)             # (B, per_oct)
        sub = idx // (H * W)
        rem = idx % (H * W)
        iy = rem // W
        ix = rem % W
        valid = vals > 0

        # subpixel offsets (dense maps, gathered)
        sp = [_subpixel_maps(ldets[i]) for i in lv_ids]
        dxs = jnp.stack([s[0] for s in sp], 1)
        dys = jnp.stack([s[1] for s in sp], 1)
        oks = jnp.stack([s[2] for s in sp], 1)

        def gat(maps, sub, iy, ix):
            flatm = maps.reshape(maps.shape[0] * maps.shape[1] * maps.shape[2])
            return flatm[sub * (H * W) + iy * W + ix]
        gatv = jax.vmap(jax.vmap(gat, in_axes=(None, 0, 0, 0)),
                        in_axes=(0, 0, 0, 0))
        dx = gatv(dxs, sub, iy, ix)
        dy = gatv(dys, sub, iy, ix)
        okd = gatv(oks.astype(jnp.float32), sub, iy, ix) > 0.5
        valid = valid & okd                                   # AKAZE drops
                                                              # non-converged
        esigmas = jnp.asarray([levels[i].meta.esigma for i in lv_ids])
        sizes = esigmas[sub] * cfg.derivative_factor          # (B, per_oct)
        # original-image coordinates (AKAZE:352): x*ratio + 0.5*(ratio-1)
        xf = (ix.astype(jnp.float32) + dx) * ratio + 0.5 * (ratio - 1.0)
        yf = (iy.astype(jnp.float32) + dy) * ratio + 0.5 * (ratio - 1.0)

        # descriptor-border check against the true image size (AKAZE:335-344)
        sigma_sz = jnp.round(sizes / ratio)
        marg = SMAX_MLDB * sigma_sz
        lvl_w = image_width.astype(jnp.float32)[:, None] / ratio
        lvl_h = image_height.astype(jnp.float32)[:, None] / ratio
        in_img = ((ix.astype(jnp.float32) - marg - 1 >= 0)
                  & (ix.astype(jnp.float32) + marg + 1 < lvl_w)
                  & (iy.astype(jnp.float32) - marg - 1 >= 0)
                  & (iy.astype(jnp.float32) + marg + 1 < lvl_h))
        valid = valid & in_img

        # orientation on this octave's derivative stacks
        lx = jnp.stack([lxs[i] for i in lv_ids], 1)
        ly = jnp.stack([lys[i] for i in lv_ids], 1)
        s_step = jnp.maximum(jnp.round(0.5 * sizes / ratio), 1.0)
        angle = _orientation(ix.astype(jnp.float32) + dx,
                             iy.astype(jnp.float32) + dy,
                             s_step, lx, ly, sub, valid)

        all_x.append(xf); all_y.append(yf)
        all_size.append(sizes * 2.0)                          # AKAZE:444
        all_angle.append(angle)
        all_resp.append(jnp.where(valid, vals, -jnp.inf))
        all_valid.append(valid)

    x = jnp.concatenate(all_x, 1); y = jnp.concatenate(all_y, 1)
    size = jnp.concatenate(all_size, 1)
    angle = jnp.concatenate(all_angle, 1)
    resp = jnp.concatenate(all_resp, 1)
    valid = jnp.concatenate(all_valid, 1)

    # global top-K by response
    k = min(max_keypoints, resp.shape[1])
    vals, order = jax.lax.top_k(resp, k)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    return Keypoints(
        xy=jnp.stack([take(x), take(y)], -1),
        scale=take(size),
        angle=take(angle),
        score=jnp.where(take(valid), vals, 0.0),
        mask=take(valid) & jnp.isfinite(vals),
    )


def detect_akaze(img, image_width=None, image_height=None,
                 cfg: ss.ScaleSpaceConfig = ss.ScaleSpaceConfig(),
                 max_keypoints: int = 4096) -> Keypoints:
    """Convenience end-to-end detector: (B, H, W) float image batch ->
    Keypoints. The TPU-native equivalent of
    ``Regard3DFeatures::detectKeypoints`` Fast-AKAZE path
    (src/Regard3DFeatures.cpp:590-614)."""
    B, H, W = img.shape
    if image_width is None:
        image_width = jnp.full((B,), W, jnp.int32)
    if image_height is None:
        image_height = jnp.full((B,), H, jnp.int32)
    levels, _ = ss.build_scale_space(img, cfg)
    return detect(levels, cfg, image_width, image_height, max_keypoints)
