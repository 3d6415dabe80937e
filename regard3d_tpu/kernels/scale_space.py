"""AKAZE nonlinear scale space as batched JAX image ops.

TPU-native rebuild of the vendored AKAZE/Fast-AKAZE scale-space construction
(`/root/reference/src/thirdparty/akaze/lib/AKAZE.cpp:101-165`,
`nldiffusion_functions.cpp`, `fed.cpp`):

* FED (fast explicit diffusion) tau schedules are computed **host-side** from
  the static config — each evolution level becomes a fixed, unrolled sequence
  of elementwise diffusion steps that XLA fuses into a handful of kernels.
* All images in a batch are processed together: arrays are (B, H, W) with
  per-octave downsampled copies; per-image contrast factors k are carried as
  (B,) vectors.
* Borders use reflect-101 padding (OpenCV BORDER_DEFAULT parity); the
  diffusion step enforces zero-flux boundaries.

Parameter parity (AKAZEConfig.h:95-116): soffset=1.6, omax=4, nsublevels=4,
diffusivity PM_G2, contrast percentile 0.7 over a 300-bin histogram,
derivative_factor=1.5, tau_max=0.25.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScaleSpaceConfig:
    omax: int = 4                 # octaves
    nsublevels: int = 4           # sublevels per octave
    soffset: float = 1.6          # base scale
    derivative_factor: float = 1.5
    dthreshold: float = 0.001     # detector response threshold (GUI presets
                                  # 0.001/0.0007/0.0005/0.0001)
    min_dthreshold: float = 1e-5
    kcontrast_percentile: float = 0.7
    kcontrast_nbins: int = 300
    tau_max: float = 0.25
    fed_reordering: bool = True   # parity flag (taus are permuted; sums equal)

    def esigma(self, octave: int, sublevel: int) -> float:
        return self.soffset * 2.0 ** (sublevel / self.nsublevels + octave)

    def etime(self, octave: int, sublevel: int) -> float:
        s = self.esigma(octave, sublevel)
        return 0.5 * s * s


@dataclasses.dataclass(frozen=True)
class LevelMeta:
    """Static metadata for one evolution level."""
    index: int
    octave: int
    sublevel: int
    esigma: float
    etime: float
    ratio: int            # 2**octave
    sigma_size: int       # round(esigma * derivative_factor / ratio)
    taus: tuple           # FED step sizes from the previous level


def fed_tau_by_process_time(T: float, M: int = 1, tau_max: float = 0.25) -> np.ndarray:
    """FED tau schedule (fed.cpp: fed_tau_by_cycle_time / fed_tau_internal).
    Host-side, static. Reordering omitted — the explicit steps commute for a
    frozen conductivity, so only the (identical) sum matters."""
    t = T / float(M)
    n = int(math.ceil(math.sqrt(3.0 * t / tau_max + 0.25) - 0.5 - 1e-8) + 0.5)
    if n <= 0:
        return np.zeros((0,), np.float32)
    scale = 3.0 * t / (tau_max * n * (n + 1))
    c = 1.0 / (4.0 * n + 2.0)
    d = scale * tau_max / 2.0
    k = np.arange(n)
    h = np.cos(math.pi * (2.0 * k + 1.0) * c)
    return (d / (h * h)).astype(np.float32)


def num_octaves(cfg: ScaleSpaceConfig, height: int = 0,
                width: int = 0) -> int:
    """Octave count capped by image size (AKAZE Allocate_Memory_Evolution:
    an octave is dropped when its level would be < 80 wide or < 40 tall)."""
    omax = cfg.omax
    if height and width:
        for i in range(1, cfg.omax):
            if (width >> i) < 80 or (height >> i) < 40:
                omax = i
                break
    return omax


def level_metas(cfg: ScaleSpaceConfig, height: int = 0,
                width: int = 0) -> List[LevelMeta]:
    metas = []
    idx = 0
    for o in range(num_octaves(cfg, height, width)):
        for j in range(cfg.nsublevels):
            es = cfg.esigma(o, j)
            et = cfg.etime(o, j)
            ratio = 1 << o
            taus = ()
            if idx > 0:
                prev = metas[-1]
                taus = tuple(fed_tau_by_process_time(et - prev.etime,
                                                     tau_max=cfg.tau_max))
            metas.append(LevelMeta(
                index=idx, octave=o, sublevel=j, esigma=es, etime=et,
                ratio=ratio,
                sigma_size=int(round(es * cfg.derivative_factor / ratio)),
                taus=taus))
            idx += 1
    return metas


# ---------------------------------------------------------------------------
# Convolution helpers (reflect-101 borders, separable)
# ---------------------------------------------------------------------------

def _pad_reflect101(img, py: int, px: int):
    if py == 0 and px == 0:
        return img
    return jnp.pad(img, ((0, 0), (py, py), (px, px)), mode="reflect")


@functools.lru_cache(maxsize=256)
def _band_matrix(n: int, kernel_bytes: bytes) -> np.ndarray:
    """Dense banded correlation matrix with reflect-101 borders:
    out[i] = sum_j M[i, j] in[j].  Cached per (length, kernel)."""
    k = np.frombuffer(kernel_bytes, np.float32)
    r = len(k) // 2
    M = np.zeros((n, n), np.float32)
    idx = np.arange(n)
    for t in range(len(k)):
        j = idx + t - r
        j = np.abs(j)                       # reflect-101 left
        j = np.where(j >= n, 2 * n - 2 - j, j)
        np.add.at(M, (idx, j), k[t])
    return M


def conv_sep_matmul(img, kx: np.ndarray, ky: np.ndarray):
    """Separable 2D correlation as two banded matmuls.

    TPU rationale: XLA lowers single-channel convolutions far off the MXU
    peak; expressing each 1-D pass as a dense (n, n) banded matrix product
    keeps the whole scale-space build on the MXU. Borders (reflect-101)
    are baked into the band matrices, so results match ``conv_sep``."""
    B, H, W = img.shape
    Mx = jnp.asarray(_band_matrix(W, np.asarray(kx, np.float32).tobytes()))
    My = jnp.asarray(_band_matrix(H, np.asarray(ky, np.float32).tobytes()))
    # x pass: out[b, y, x] = sum_j img[b, y, j] Mx[x, j]
    out = jnp.einsum("byj,xj->byx", img, Mx,
                     preferred_element_type=jnp.float32)
    # y pass: out[b, y, x] = sum_j My[y, j] out[b, j, x]
    return jnp.einsum("yj,bjx->byx", My, out,
                      preferred_element_type=jnp.float32)


def conv_sep(img, kx: np.ndarray, ky: np.ndarray, use_matmul=None):
    """Separable 2D convolution on (B, H, W). kx applies along width (x),
    ky along height (y). Correlation convention (OpenCV filter2D parity).

    On TPU backends large planes route to the banded-matmul formulation
    (MXU); other backends/small planes use ``conv_general_dilated``."""
    B, H, W = img.shape
    if use_matmul is None:
        use_matmul = (jax.default_backend() == "tpu"
                      and H >= 128 and W >= 128)
    if use_matmul:
        return conv_sep_matmul(img, kx, ky)
    ry, rx = len(ky) // 2, len(kx) // 2
    p = _pad_reflect101(img, ry, rx)
    x = p[:, None, :, :]  # NCHW
    kya = jnp.asarray(ky, img.dtype).reshape(1, 1, len(ky), 1)
    kxa = jnp.asarray(kx, img.dtype).reshape(1, 1, 1, len(kx))
    # XLA conv is cross-correlation (no kernel flip) — matches filter2D
    x = jax.lax.conv_general_dilated(x, kya, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kxa, (1, 1), "VALID")
    return x[:, 0]


def gaussian_ksize(sigma: float) -> int:
    """OpenCV-parity automatic kernel size (nldiffusion gaussian_2D_convolution)."""
    k = int(math.ceil(2.0 * (1.0 + (sigma - 0.8) / 0.3)))
    if k % 2 == 0:
        k += 1
    return max(k, 3)


def gaussian_kernel1d(sigma: float, ksize: int = 0) -> np.ndarray:
    if ksize <= 0:
        ksize = gaussian_ksize(sigma)
    x = np.arange(ksize) - (ksize - 1) / 2.0
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def gaussian_blur(img, sigma: float, ksize: int = 0, use_matmul=None):
    k = gaussian_kernel1d(sigma, ksize)
    return conv_sep(img, k, k, use_matmul)


def scharr_kernels(scale: int):
    """Scaled Scharr derivative kernels (AKAZE compute_derivative_kernels):
    smoothing [norm, 0.., w*norm, .., 0, norm], derivative [-1, 0.., 0, .., 1],
    w = 10/3, ksize = 3 + 2*(scale-1)."""
    if scale == 1:
        # OpenCV normalized Scharr: smooth scaled by 1/32, deriv kept integer
        # -> unit response on a unit ramp (matches the scale>1 normalization)
        deriv = np.array([-1.0, 0.0, 1.0], np.float32)
        smooth = np.array([3.0, 10.0, 3.0], np.float32) / 32.0
        return deriv, smooth
    ksize = 3 + 2 * (scale - 1)
    w = 10.0 / 3.0
    norm = 1.0 / (2.0 * scale * (w + 2.0))
    smooth = np.zeros(ksize, np.float32)
    smooth[0] = norm
    smooth[ksize // 2] = w * norm
    smooth[-1] = norm
    deriv = np.zeros(ksize, np.float32)
    deriv[0] = -1.0
    deriv[-1] = 1.0
    return deriv, smooth


def scharr(img, dx: int, dy: int, scale: int = 1):
    """Scharr derivative of order (dx, dy) ∈ {(1,0),(0,1)} at given scale."""
    deriv, smooth = scharr_kernels(scale)
    if dx == 1:
        return conv_sep(img, deriv, smooth)
    return conv_sep(img, smooth, deriv)


def halfsample(img):
    """2x2 area downsample (halfsample_image / INTER_AREA parity)."""
    B, H, W = img.shape
    return img.reshape(B, H // 2, 2, W // 2, 2).mean((2, 4))


# ---------------------------------------------------------------------------
# Diffusion
# ---------------------------------------------------------------------------

def pm_g2(Lx, Ly, k):
    """Perona–Malik g2 conductivity: 1 / (1 + |grad|^2 / k^2). k: (B,)."""
    k2 = (k * k)[:, None, None]
    return 1.0 / (1.0 + (Lx * Lx + Ly * Ly) / k2)


def nld_step(L, g, tau: float):
    """One explicit diffusion step with zero-flux borders
    (nldiffusion_functions.cpp nld_step_scalar parity)."""
    # flux to the right/left/down/up neighbours; zero at borders
    gsum_r = g[:, :, 1:] + g[:, :, :-1]
    diff_r = L[:, :, 1:] - L[:, :, :-1]
    flux_x = gsum_r * diff_r                      # (B, H, W-1)
    gsum_d = g[:, 1:, :] + g[:, :-1, :]
    diff_d = L[:, 1:, :] - L[:, :-1, :]
    flux_y = gsum_d * diff_d                      # (B, H-1, W)
    zx = jnp.zeros_like(L[:, :, :1])
    zy = jnp.zeros_like(L[:, :1, :])
    div = (jnp.concatenate([flux_x, zx], 2) - jnp.concatenate([zx, flux_x], 2)
           + jnp.concatenate([flux_y, zy], 1) - jnp.concatenate([zy, flux_y], 1))
    return L + (0.5 * tau) * div


def compute_k_percentile(img, cfg: ScaleSpaceConfig):
    """Contrast factor k = gradient-magnitude percentile
    (compute_k_percentile parity: smooth sigma=1, Scharr, 300-bin histogram,
    70th percentile of nonzero magnitudes). img: (B, H, W) -> k: (B,)."""
    smooth = gaussian_blur(img, 1.0)
    lx = scharr(smooth, 1, 0, 1)
    ly = scharr(smooth, 0, 1, 1)
    # interior pixels only (reference loops 1..rows-1)
    modg = jnp.sqrt(lx * lx + ly * ly)[:, 1:-1, 1:-1]
    B = modg.shape[0]
    flat = modg.reshape(B, -1)
    hmax = jnp.max(flat, axis=1, keepdims=True)
    nbins = cfg.kcontrast_nbins
    scaled = flat / jnp.where(hmax > 0, hmax, 1.0)
    nbin = jnp.clip((scaled * nbins).astype(jnp.int32), 0, nbins - 1)
    valid = flat > 0
    onehot = jax.nn.one_hot(nbin, nbins, dtype=jnp.float32)
    hist = jnp.sum(onehot * valid[..., None], axis=1)         # (B, nbins)
    npoints = jnp.sum(valid, axis=1).astype(jnp.float32)
    csum = jnp.cumsum(hist, axis=1)
    target = cfg.kcontrast_percentile * npoints
    kbin = jnp.argmax(csum > target[:, None], axis=1).astype(jnp.float32)
    reached = csum[:, -1] > target
    k = jnp.where(reached, hmax[:, 0] * kbin / nbins, 0.03)
    return jnp.where(k > 0, k, 0.03)


@dataclasses.dataclass
class Evolution:
    """One evolution level's tensors (all (B, H_o, W_o))."""
    meta: LevelMeta
    Lt: jnp.ndarray        # diffused image
    Lsmooth: jnp.ndarray   # gaussian(sigma=1) of Lt


def build_scale_space(img, cfg: ScaleSpaceConfig = ScaleSpaceConfig()):
    """img: (B, H, W) float in [0,1]; H, W divisible by 2**(omax-1).
    Returns (levels: List[Evolution], kcontrast: (B,))."""
    B, H, W = img.shape
    no = num_octaves(cfg, H, W)
    assert H % (1 << (no - 1)) == 0 and W % (1 << (no - 1)) == 0, \
        f"image dims {H}x{W} must be divisible by {1 << (no - 1)}"
    metas = level_metas(cfg, H, W)
    k = compute_k_percentile(img, cfg)

    Lt = gaussian_blur(img, cfg.soffset)
    levels: List[Evolution] = []
    # level 0: Lsmooth IS Lt (reference copies, AKAZE.cpp:116)
    levels.append(Evolution(metas[0], Lt, Lt))
    kcur = k
    for m in metas[1:]:
        prev = levels[-1]
        if m.octave > prev.meta.octave:
            Lt = halfsample(prev.Lt)
            kcur = kcur * 0.75
        else:
            Lt = prev.Lt
        # the reference stores Lsmooth = blur of the PRE-diffusion Lt
        # (AKAZE.cpp:128-141: Lsmooth/flow are computed before the FED
        # steps advance Lt) — detection derivatives for level i therefore
        # see the level-(i-1) diffusion state, one step "early"
        Lsmooth = gaussian_blur(Lt, 1.0)
        Lx = scharr(Lsmooth, 1, 0, 1)
        Ly = scharr(Lsmooth, 0, 1, 1)
        g = pm_g2(Lx, Ly, kcur)
        for tau in m.taus:
            Lt = nld_step(Lt, g, float(tau))
        levels.append(Evolution(m, Lt, Lsmooth))
    return levels, k
