import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.kernels import detect, scale_space as ss


def test_fed_tau_schedule():
    taus = ss.fed_tau_by_process_time(1.0, tau_max=0.25)
    assert len(taus) > 0
    # all steps positive; none below tau_max/4 (property of FED cosines);
    # steps can exceed tau_max (that's the point of FED)
    assert (taus > 0).all()
    np.testing.assert_allclose(taus.sum(), 1.0, rtol=1e-5)
    assert taus.max() > 0.25


def test_level_metas():
    cfg = ss.ScaleSpaceConfig()
    metas = ss.level_metas(cfg)
    assert len(metas) == 16
    assert metas[0].esigma == pytest.approx(1.6)
    assert metas[4].octave == 1 and metas[4].ratio == 2
    # etime strictly increasing
    ets = [m.etime for m in metas]
    assert all(b > a for a, b in zip(ets, ets[1:]))


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.uniform(size=(2, 64, 64)), jnp.float32)
    out = ss.gaussian_blur(img, 1.6)
    np.testing.assert_allclose(float(out.mean()), float(img.mean()), atol=5e-3)
    assert float(out.std()) < float(img.std())


def test_scharr_on_ramp():
    # horizontal ramp -> constant Lx, zero Ly
    x = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32), (1, 32, 32))
    lx = ss.scharr(x, 1, 0, 1)
    ly = ss.scharr(x, 0, 1, 1)
    np.testing.assert_allclose(np.asarray(lx[0, 8:-8, 8:-8]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ly[0, 8:-8, 8:-8]), 0.0, atol=1e-4)


def test_nld_step_conserves_mass(rng):
    L = jnp.asarray(rng.uniform(size=(1, 32, 32)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.2, 1.0, size=(1, 32, 32)), jnp.float32)
    L2 = ss.nld_step(L, g, 0.25)
    # zero-flux boundaries: total intensity conserved
    np.testing.assert_allclose(float(L2.sum()), float(L.sum()), rtol=1e-5)


def test_diffusion_smooths_noise(rng):
    L = jnp.asarray(rng.normal(size=(1, 64, 64)), jnp.float32)
    g = jnp.ones_like(L)
    out = L
    for _ in range(10):
        out = ss.nld_step(out, g, 0.2)
    assert float(out.std()) < 0.6 * float(L.std())


def test_halfsample():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4)
    out = ss.halfsample(img)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [[2.5, 4.5], [10.5, 12.5]])


def test_build_scale_space_shapes(rng):
    # octave count follows the reference's size cap (an octave is dropped
    # when its level would be < 80 wide or < 40 tall,
    # AKAZE.cpp Allocate_Memory_Evolution): 64x64 -> 1 octave only
    img = jnp.asarray(rng.uniform(size=(2, 64, 64)), jnp.float32)
    levels, k = ss.build_scale_space(img)
    assert len(levels) == 4
    assert levels[0].Lt.shape == (2, 64, 64)
    assert k.shape == (2,)
    assert bool(jnp.all(k > 0))

    # 320x320 -> 3 octaves (320/8 = 40 < 80 kills octave 3), 12 levels
    img = jnp.asarray(rng.uniform(size=(1, 320, 320)), jnp.float32)
    levels, _ = ss.build_scale_space(img)
    assert len(levels) == 12
    assert levels[4].Lt.shape == (1, 160, 160)
    assert levels[8].Lt.shape == (1, 80, 80)


def _synthetic_corners(h=128, w=128, seed=3):
    """Checkerboard-corner test image: well-separated corner structures.
    The seed jitters positions slightly so batch tests get distinct images."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32) + 0.5
    centers = []
    for cy0, cx0 in [(32, 32), (32, 96), (96, 32), (96, 96), (64, 64)]:
        cy = cy0 + int(rng.integers(-4, 5))
        cx = cx0 + int(rng.integers(-4, 5))
        r = 6
        img[cy - r:cy + r, cx - r:cx + r] = 1.0
        img[cy - r:cy, cx - r:cx] = 0.0
        img[cy:cy + r, cx:cx + r] = 0.0
        centers.append((cx, cy))
    return img, centers


def test_detect_finds_corners():
    img, centers = _synthetic_corners()
    kps = detect.detect_akaze(jnp.asarray(img)[None], max_keypoints=512)
    assert kps.xy.shape == (1, 512, 2)
    got = np.asarray(kps.xy[0])[np.asarray(kps.mask[0])]
    assert len(got) >= len(centers)
    # det-of-Hessian is a blob detector: responses sit on the quadrant blobs
    # around each crossing, within the structure's radius (6 px)
    for cx, cy in centers:
        d = np.hypot(got[:, 0] - cx, got[:, 1] - cy).min()
        assert d < 6.0, (cx, cy, d)


def test_detect_empty_image():
    img = jnp.full((1, 64, 64), 0.5, jnp.float32)
    kps = detect.detect_akaze(img, max_keypoints=128)
    assert int(kps.mask.sum()) == 0


def test_detect_batch_independence():
    img1, _ = _synthetic_corners(seed=1)
    img2, _ = _synthetic_corners(seed=2)
    b = jnp.asarray(np.stack([img1, img2]))
    kb = detect.detect_akaze(b, max_keypoints=256)
    k1 = detect.detect_akaze(jnp.asarray(img1)[None], max_keypoints=256)
    np.testing.assert_allclose(np.asarray(kb.xy[0])[np.asarray(kb.mask[0])],
                               np.asarray(k1.xy[0])[np.asarray(k1.mask[0])],
                               atol=1e-4)


def test_detect_angles_in_range():
    img, _ = _synthetic_corners()
    kps = detect.detect_akaze(jnp.asarray(img)[None], max_keypoints=256)
    ang = np.asarray(kps.angle[0])[np.asarray(kps.mask[0])]
    assert ((ang >= 0) & (ang < 2 * np.pi + 1e-6)).all()


def test_nms3x3_strict_suppresses_plateaus():
    # AKAZE extrema use strict '>' vs all 8 neighbours
    # (akaze/lib/AKAZE.cpp Find_Scale_Space_Extrema): a 2-pixel plateau of
    # equal maxima must yield NO keypoint, a strict peak exactly one.
    r = np.zeros((1, 9, 9), np.float32)
    r[0, 3, 3] = 1.0
    r[0, 3, 4] = 1.0          # plateau partner
    r[0, 6, 6] = 2.0          # strict peak
    mask = np.asarray(detect._nms3x3(jnp.asarray(r), 0.1, 0.0))
    assert not mask[0, 3, 3] and not mask[0, 3, 4]
    assert mask[0, 6, 6]
    assert mask.sum() == 1


def test_nms3x3_border_and_threshold():
    r = np.zeros((1, 7, 7), np.float32)
    r[0, 0, 0] = 5.0          # border: excluded even though maximal
    r[0, 3, 3] = 0.05         # below threshold
    mask = np.asarray(detect._nms3x3(jnp.asarray(r), 0.1, 0.0))
    assert mask.sum() == 0
