"""TPU-native surface reconstruction: FFT Poisson solve on a dense grid.

The reference shells out to PoissonRecon/SurfaceTrimmer
(``src/R3DSurfaceGenProcess.cpp:105-141``).  This module is the in-process
equivalent, built around the Fourier formulation of Poisson surface
reconstruction (Kazhdan, SGP 2005 — the precursor of the screened-octree
solver the external binary implements): an oriented point cloud defines a
smoothed normal vector field V; the indicator function chi satisfies
``laplacian(chi) = div V``, which diagonalizes under the DFT, so the whole
solve is three FFTs, an elementwise spectral multiply, and an inverse FFT
— exactly the dense, statically-shaped workload a TPU likes (the external
tool's octree + conjugate-gradient approach is pointer-chasing by design
and would waste the hardware).

Pipeline: normalize points into the unit cube -> trilinear scatter of
normals (and a density channel) onto an N^3 grid -> Gaussian smoothing in
the spectral domain -> spectral inverse Laplacian -> isolevel = density-
weighted mean of chi at the samples -> marching tetrahedra
(:mod:`regard3d_tpu.surface.marching`) -> density-based trimming
(SurfaceTrimmer parity).

Parameter parity with the reference dialog (src/R3DProject.h:155-170):
``depth`` -> grid resolution 2^depth per axis (dense, capped at 256);
``samples_per_node`` -> splat smoothing width scale; ``point_weight`` ->
screening weight (0 = pure gradient fit); ``trim_threshold`` -> density
percentile below which triangles are trimmed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def normalize_points(xyz: np.ndarray, margin: float = 0.1):
    """Map points into [margin, 1-margin]^3 preserving aspect.

    Returns (unit_xyz, scale, offset) with ``xyz = unit * scale + offset``."""
    lo = xyz.min(0)
    hi = xyz.max(0)
    extent = float((hi - lo).max())
    scale = extent / (1.0 - 2.0 * margin)
    center = 0.5 * (lo + hi)
    offset = center - 0.5 * scale
    return (xyz - offset) / scale, scale, offset


@functools.partial(jax.jit, static_argnames=("n",))
def splat_field(unit_xyz: jnp.ndarray, normals: jnp.ndarray, n: int):
    """Trilinear scatter of (normal, density) onto an n^3 grid.

    Returns (V, W): V (n, n, n, 3) normal field, W (n, n, n) density."""
    p = unit_xyz * (n - 1)
    p0 = jnp.floor(p)
    f = p - p0
    i0 = jnp.clip(p0.astype(jnp.int32), 0, n - 2)

    V = jnp.zeros((n, n, n, 3), jnp.float32)
    W = jnp.zeros((n, n, n), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                idx = (i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz)
                V = V.at[idx].add(w[:, None] * normals)
                W = W.at[idx].add(w)
    return V, W


@functools.partial(jax.jit, static_argnames=("n",))
def solve_indicator(V: jnp.ndarray, n: int, sigma_vox: float = 1.5,
                    screen: float = 0.0):
    """Spectral solve of ``(laplacian - screen) chi = div V_smooth``.

    All operators diagonalize under the 3D DFT with periodic boundaries
    (the margin in :func:`normalize_points` keeps the surface away from the
    wrap-around seam).  Derivatives use the exact spectral symbols so div
    and the inverse Laplacian are mutually consistent."""
    k = jnp.fft.fftfreq(n).astype(jnp.float32) * 2.0 * jnp.pi
    kx = k[:, None, None]
    ky = k[None, :, None]
    kz = k[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz

    # Gaussian smoothing of the splatted field, fused into the solve
    g = jnp.exp(-0.5 * (sigma_vox ** 2) * k2)

    Vx = jnp.fft.fftn(V[..., 0])
    Vy = jnp.fft.fftn(V[..., 1])
    Vz = jnp.fft.fftn(V[..., 2])
    div = 1j * (kx * Vx + ky * Vy + kz * Vz) * g
    denom = -(k2 + screen)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    chi_hat = jnp.where(k2 < 1e-12, 0.0, div / denom)
    # sign: with OUTWARD input normals the raw solution is lower inside;
    # negate so chi acts as an indicator (higher inside), which is what
    # the marching step's outward-orientation rule assumes.
    return -jnp.real(jnp.fft.ifftn(chi_hat)).astype(jnp.float32)


@jax.jit
def sample_trilinear(vol: jnp.ndarray, unit_xyz: jnp.ndarray):
    """Trilinear sample of an n^3 volume at unit-cube points."""
    n = vol.shape[0]
    p = unit_xyz * (n - 1)
    p0 = jnp.floor(p)
    f = p - p0
    i0 = jnp.clip(p0.astype(jnp.int32), 0, n - 2)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                     * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                     * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                out = out + w * vol[i0[:, 0] + dx, i0[:, 1] + dy,
                                    i0[:, 2] + dz]
    return out


def reconstruct(xyz: np.ndarray, normals: np.ndarray, depth: int = 7,
                samples_per_node: float = 1.0, point_weight: float = 0.0,
                trim_threshold: float = 7.0):
    """Oriented cloud -> triangle mesh (vertices in input coordinates).

    Args mirror the reference surface dialog: ``depth`` (grid 2^depth,
    capped 256), ``samples_per_node`` (smoothing scale), ``point_weight``
    (screening), ``trim_threshold`` (0..10 density trim, 0 = keep all —
    SurfaceTrimmer --trim parity at the same scale).

    Returns (verts (M, 3) float, faces (T, 3) int32).
    """
    from regard3d_tpu.surface import marching

    n = min(2 ** depth, 256)
    unit, scale, offset = normalize_points(np.asarray(xyz, np.float32))
    nrm = np.asarray(normals, np.float32)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

    V, W = splat_field(jnp.asarray(unit, jnp.float32),
                       jnp.asarray(nrm, jnp.float32), n)
    sigma = 1.5 * float(np.sqrt(samples_per_node))
    chi = solve_indicator(V, n, sigma_vox=sigma,
                          screen=float(point_weight) * 1e-2)

    # isolevel: density-weighted mean of chi at the input samples
    chi_s = sample_trilinear(chi, jnp.asarray(unit, jnp.float32))
    iso = float(jnp.mean(chi_s))

    chi_np = np.asarray(chi)
    verts_u, faces = marching.marching_tetrahedra(chi_np, iso)

    if trim_threshold > 0 and len(faces):
        # trim triangles lying in low-density space (SurfaceTrimmer role):
        # threshold is a percentile-like 0..10 knob on the smoothed density
        Ws = np.asarray(jax.jit(
            lambda w: jnp.real(jnp.fft.ifftn(
                jnp.fft.fftn(w) * jnp.exp(
                    -0.5 * (2.0 ** 2)
                    * (jnp.sum(jnp.stack(jnp.meshgrid(
                        *([jnp.fft.fftfreq(n).astype(jnp.float32)
                           * 2 * jnp.pi] * 3), indexing="ij")) ** 2,
                        axis=0))))))(jnp.asarray(W)))
        cent = verts_u[faces].mean(1)
        dens = np.asarray(sample_trilinear(
            jnp.asarray(Ws, jnp.float32), jnp.asarray(cent, jnp.float32)))
        ref_dens = np.percentile(
            np.asarray(sample_trilinear(jnp.asarray(Ws, jnp.float32),
                                        jnp.asarray(unit, jnp.float32))), 25)
        keep = dens > ref_dens * (trim_threshold / 10.0) * 0.5
        faces = faces[keep]
        verts_u, faces = marching.compact_mesh(verts_u, faces)

    verts = verts_u * scale + offset
    return verts.astype(np.float64), faces
