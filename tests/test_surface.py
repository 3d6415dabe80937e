"""Native surface reconstruction (FFT Poisson + marching tetrahedra).

Oracles: analytic shapes (sphere/hemisphere) with known radius, watertight
topology invariants (every edge shared by exactly two faces), and outward
orientation against the analytic normal."""

import numpy as np
import pytest

from regard3d_tpu.surface import marching, poisson


def _sphere_cloud(rng, n=15000, r=2.0, center=(10.0, -5.0, 3.0)):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * r + np.asarray(center), v


def test_marching_tetrahedra_sphere_level_set():
    """Analytic SDF volume: extracted surface must sit on the level set."""
    n = 48
    g = np.linspace(0, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = 0.3 - np.sqrt((X - .5) ** 2 + (Y - .5) ** 2 + (Z - .5) ** 2)
    verts, faces = marching.marching_tetrahedra(vol.astype(np.float32), 0.0)
    assert len(faces) > 1000
    r = np.linalg.norm(verts - 0.5, axis=1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=2e-3)
    assert r.std() < 2e-3
    # watertight: each edge shared by exactly 2 faces
    E = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(E, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward orientation (vol is larger inside)
    cent = verts[faces].mean(1)
    nr = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    rad = cent - 0.5
    assert ((nr * rad).sum(1) > 0).mean() > 0.99


def test_poisson_reconstruct_sphere(rng):
    xyz, nrm = _sphere_cloud(rng)
    verts, faces = poisson.reconstruct(xyz, nrm, depth=6, trim_threshold=0.0)
    assert len(faces) > 5000
    r = np.linalg.norm(verts - [10.0, -5.0, 3.0], axis=1)
    np.testing.assert_allclose(r.mean(), 2.0, atol=0.02)
    assert r.std() < 0.02
    cent = verts[faces].mean(1)
    nr = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    rad = cent - [10.0, -5.0, 3.0]
    assert ((nr * rad).sum(1) > 0).mean() > 0.99


def test_poisson_trimming_removes_unsupported(rng):
    """Hemisphere cloud: trimming must cut the hallucinated lower half
    (SurfaceTrimmer-parity behavior)."""
    v = rng.normal(size=(20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    hemi = v[v[:, 2] > 0]
    xyz = hemi * 2.0
    v_t, f_t = poisson.reconstruct(xyz, hemi, depth=6, trim_threshold=7.0)
    v_a, f_a = poisson.reconstruct(xyz, hemi, depth=6, trim_threshold=0.0)
    assert len(f_t) < 0.8 * len(f_a)
    assert v_t[:, 2].min() > v_a[:, 2].min() + 0.3


def test_compact_mesh():
    verts = np.arange(15, dtype=np.float64).reshape(5, 3)
    faces = np.array([[0, 2, 4]], np.int32)
    v2, f2 = marching.compact_mesh(verts, faces)
    assert v2.shape == (3, 3)
    np.testing.assert_array_equal(f2, [[0, 1, 2]])
    np.testing.assert_array_equal(v2[f2[0]], verts[[0, 2, 4]])


@pytest.mark.slow
def test_surface_on_mvs_cloud(rng):
    """Chain: rendered scene -> native densify -> native surface; the mesh
    must hug the two ground-truth planes."""
    from regard3d_tpu.mvs import driver
    from tests.test_mvs import _scene_from_render
    from tests.test_pipeline import render_scene

    sc = render_scene(rng, n_cams=5, hw=192, f=248.0)
    scene = _scene_from_render(sc, n_lm=200)
    images = [(np.clip(im, 0, 1) * 255).astype(np.uint8)
              for im in sc["images"]]
    xyz, nrm, _rgb, _ = driver.densify_scene(
        scene, images, level=0, num_planes=64, threshold=0.6,
        num_sources=4, min_image_num=3)
    verts, faces = poisson.reconstruct(xyz, nrm, depth=6,
                                       trim_threshold=7.0)
    assert len(faces) > 1000
    d = np.minimum(np.abs(verts[:, 2] - 8.0), np.abs(verts[:, 2] - 13.0))
    assert np.median(d) < 0.3
