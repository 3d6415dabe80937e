"""TPU-native dense multi-view stereo: plane-sweep depth maps.

The reference delegates densification to external CPU binaries
(CMVS/PMVS2: ``src/R3DDensificationProcess.cpp:105-183``).  This module is
the in-process TPU replacement: per reference view, a plane-sweep cost
volume is built by homography-warping the source views onto a stack of
fronto-parallel (inverse-depth-uniform) planes, scoring ZNCC over a window,
aggregating the best-k source costs, and taking the winner with sub-plane
parabolic refinement — the same photometric-consistency objective PMVS
optimizes patch-wise, recast as dense statically-shaped tensor work:

* warps are batched bilinear gathers over a ``(sources, planes)`` grid;
* ZNCC windows are separable box sums (``lax.reduce_window``) that XLA
  fuses with the elementwise cost math;
* the depth axis is processed in fixed-size chunks under ``lax.scan`` to
  bound HBM (the full aggregated volume is only D x H x W).

Parameter parity with the PMVS option file written by the reference
(``src/utils/OpenMVGHelper.cpp:489-952``): ``level`` (pyramid level),
``csize`` (cell size -> output grid step), ``threshold`` (NCC acceptance),
``wsize`` (ZNCC window), ``minImageNum`` (consistent-view count, enforced
in :mod:`regard3d_tpu.mvs.fusion`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PlaneSweepParams:
    """Knobs, mirroring the reference's PMVS parameter surface
    (src/R3DProject.h:201-213 pmvs* members)."""

    level: int = 1            # pyramid level: images downsampled 2^level
    num_planes: int = 96      # depth hypotheses (inverse-depth uniform)
    wsize: int = 7            # ZNCC window (PMVS wsize default 7)
    threshold: float = 0.7    # NCC acceptance (PMVS threshold default 0.7)
    num_sources: int = 6      # source views per reference view
    agg_top_k: int = 3        # best-k source aggregation per pixel
    plane_chunk: int = 8      # depth planes warped per scan step (HBM bound)


def box_sum(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """Windowed sum with SAME padding over the last two axes.

    Separable two-pass reduce_window — XLA lowers each pass to a cheap
    strided reduction on the VPU."""
    pad = w // 2
    dims = (1,) * (x.ndim - 2) + (w, 1)
    pads = ((0, 0),) * (x.ndim - 2) + ((pad, pad), (0, 0))
    y = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, (1,) * x.ndim, pads)
    dims = (1,) * (x.ndim - 2) + (1, w)
    pads = ((0, 0),) * (x.ndim - 2) + ((0, 0), (pad, pad))
    return jax.lax.reduce_window(y, 0.0, jax.lax.add, dims, (1,) * x.ndim,
                                 pads)


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample ``img`` (H, W) at float coords; returns (values, in-bounds).

    Out-of-bounds samples are masked, not clamped-and-trusted."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x0i + 1]
    v10 = img[y0i + 1, x0i]
    v11 = img[y0i + 1, x0i + 1]
    val = ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
           + (1 - fx) * fy * v10 + fx * fy * v11)
    ok = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    return val, ok


def plane_homographies(K_ref: np.ndarray, R_ref: np.ndarray,
                       C_ref: np.ndarray, K_src: np.ndarray,
                       R_src: np.ndarray, C_src: np.ndarray,
                       depths: np.ndarray) -> np.ndarray:
    """Homographies mapping reference pixels to source pixels for the
    fronto-parallel plane z=d in the reference camera frame.

    With the OpenMVG pose convention x_cam = R (X - C):
    ``x_s = R_rel x_r + t_rel`` where ``R_rel = R_s R_r^T`` and
    ``t_rel = R_s (C_r - C_s)``; for the plane n=[0,0,1], n.x_r = d the
    induced homography is ``K_s (R_rel + t_rel n^T / d) K_r^{-1}``.

    Shapes: R_src/C_src/K_src may carry a leading source axis S;
    depths (D,).  Returns (S, D, 3, 3) float64 (host-side tiny math)."""
    R_src = np.atleast_3d(R_src).reshape(-1, 3, 3)
    C_src = np.asarray(C_src).reshape(-1, 3)
    K_src = np.asarray(K_src).reshape(-1, 3, 3)
    S = R_src.shape[0]
    D = len(depths)
    Kri = np.linalg.inv(K_ref)
    out = np.zeros((S, D, 3, 3))
    for s in range(S):
        R_rel = R_src[s] @ R_ref.T
        t_rel = R_src[s] @ (C_ref - C_src[s])
        for k, d in enumerate(depths):
            Hm = K_src[s] @ (R_rel + np.outer(t_rel, [0.0, 0.0, 1.0]) / d) @ Kri
            out[s, k] = Hm / Hm[2, 2]
    return out


def inverse_depth_planes(dmin: float, dmax: float, n: int) -> np.ndarray:
    """Inverse-depth-uniform hypotheses (near planes denser — matching the
    pixel-displacement metric of the sweep)."""
    return 1.0 / np.linspace(1.0 / dmax, 1.0 / dmin, n)[::-1]


@functools.partial(jax.jit, static_argnames=("wsize", "top_k", "chunk"))
def sweep(ref: jnp.ndarray, srcs: jnp.ndarray, src_valid: jnp.ndarray,
          homos: jnp.ndarray, idepths: jnp.ndarray,
          wsize: int = 7, top_k: int = 3, chunk: int = 8):
    """Plane-sweep one reference view.

    Args:
      ref: (H, W) float32 grayscale reference image.
      srcs: (S, H, W) float32 source images (padded; see src_valid).
      src_valid: (S,) bool — live sources (padding rows scored out).
      homos: (S, D, 3, 3) float32 ref-pixel -> src-pixel homographies.
      idepths: (D,) float32 inverse depths of the planes (uniform grid).
      wsize/top_k/chunk: window, best-k aggregation, planes per scan step.

    Returns (idepth, ncc): (H, W) refined inverse depth and best aggregated
    NCC score in [-1, 1] (confidence; threshold outside).
    """
    H, W = ref.shape
    S, D = homos.shape[0], homos.shape[1]
    assert D % chunk == 0, "num_planes must be divisible by plane_chunk"

    # scale-invariance guard: normalize photometry so the small epsilons in
    # the ZNCC denominators and the texturedness gate are meaningful for any
    # input range (uint8-scaled, [0,1] floats, raw sensor values, ...)
    norm = jax.lax.rsqrt(jnp.mean(jnp.square(ref - jnp.mean(ref))) + 1e-20)
    ref = ref * norm
    srcs = srcs * norm

    ys, xs = jnp.mgrid[0:H, 0:W]
    ones = jnp.ones_like(xs, jnp.float32)
    pix = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32), ones], 0)
    pix = pix.reshape(3, H * W)                      # (3, HW)

    w2 = float(wsize * wsize)
    s_r = box_sum(ref, wsize)
    s_rr = box_sum(ref * ref, wsize)
    var_r = jnp.maximum(s_rr - s_r * s_r / w2, 0.0)

    def one_plane(hm_sd, src, valid):
        """ZNCC cost map (H, W) for one (source, plane)."""
        q = hm_sd @ pix                               # (3, HW)
        zs = q[2]
        sx = (q[0] / zs).reshape(H, W)
        sy = (q[1] / zs).reshape(H, W)
        warped, ok = bilinear_sample(src, sx, sy)
        ok = ok & (zs.reshape(H, W) > 1e-6) & valid
        warped = jnp.where(ok, warped, 0.0)
        okf = ok.astype(jnp.float32)
        n = box_sum(okf, wsize)
        s_s = box_sum(warped, wsize)
        s_ss = box_sum(warped * warped, wsize)
        s_rs = box_sum(ref * okf * warped, wsize)
        sr_loc = box_sum(ref * okf, wsize)
        srr_loc = box_sum(ref * ref * okf, wsize)
        nn = jnp.maximum(n, 1.0)
        cov = s_rs - sr_loc * s_s / nn
        var_rl = jnp.maximum(srr_loc - sr_loc * sr_loc / nn, 0.0)
        var_s = jnp.maximum(s_ss - s_s * s_s / nn, 0.0)
        ncc = cov * jax.lax.rsqrt(var_rl * var_s + 1e-9)
        enough = n >= 0.75 * w2
        textured = var_r > 1e-8 * w2
        return jnp.where(enough & textured, 1.0 - ncc, 2.0)   # cost in [0,2]

    def chunk_costs(homos_chunk):
        """Aggregated cost (chunk, H, W) over sources for a plane chunk."""
        # vmap over sources and planes; (S, chunk, H, W)
        costs = jax.vmap(
            lambda hs, src, val: jax.vmap(
                lambda hm: one_plane(hm, src, val))(hs)
        )(homos_chunk, srcs, src_valid)
        # best-k mean over the source axis
        neg, _ = jax.lax.top_k(-costs.transpose(1, 2, 3, 0), top_k)
        return jnp.mean(-neg, axis=-1)                # (chunk, H, W)

    homos_c = homos.transpose(1, 0, 2, 3).reshape(D // chunk, chunk, S, 3, 3)
    homos_c = homos_c.transpose(0, 2, 1, 3, 4)        # (nc, S, chunk, 3, 3)
    _, vol = jax.lax.scan(
        lambda c, h: (c, chunk_costs(h)), None, homos_c)
    vol = vol.reshape(D, H, W)

    best = jnp.argmin(vol, axis=0)                    # (H, W)
    c1 = jnp.min(vol, axis=0)
    ym, xm = jnp.mgrid[0:H, 0:W]
    c0 = vol[jnp.maximum(best - 1, 0), ym, xm]
    c2 = vol[jnp.minimum(best + 1, D - 1), ym, xm]
    denom = c0 - 2.0 * c1 + c2
    offset = jnp.where(jnp.abs(denom) > 1e-9,
                       0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-9,
                                                   denom, 1.0), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    did = idepths[1] - idepths[0]                     # uniform grid step
    idepth = idepths[best] + offset * did
    return idepth, 1.0 - c1
