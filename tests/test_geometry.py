import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras
from regard3d_tpu.kernels import geometry, ransac


def synth_two_view(rng, n=200, noise=0.0, outlier_frac=0.0, f=800.0,
                   w=1280, h=960):
    """Synthetic calibrated two-view scene. Returns dict of everything."""
    X = rng.normal(size=(n, 3)) * np.array([2.0, 1.5, 1.0]) + np.array([0, 0, 6.0])
    R1, C1 = np.eye(3), np.zeros(3)
    wvec = np.array([0.03, -0.25, 0.02])
    R2 = np.asarray(cameras.exp_so3(jnp.asarray(wvec)))
    C2 = np.array([1.2, 0.1, 0.3])
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])

    def proj(R, C):
        xc = (R @ (X - C).T).T
        xn = xc[:, :2] / xc[:, 2:]
        uv = xn * f + np.array([w / 2, h / 2])
        return uv, xn

    uv1, xn1 = proj(R1, C1)
    uv2, xn2 = proj(R2, C2)
    uv1 += rng.normal(size=uv1.shape) * noise
    uv2 += rng.normal(size=uv2.shape) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] = rng.uniform([0, 0], [w, h], size=(n_out, 2))
    xn1 = (uv1 - np.array([w / 2, h / 2])) / f
    xn2 = (uv2 - np.array([w / 2, h / 2])) / f
    inlier_mask = np.ones(n, bool)
    if n_out:
        inlier_mask[idx] = False
    return dict(X=X, R2=R2, C2=C2, uv1=uv1, uv2=uv2, xn1=xn1, xn2=xn2,
                f=f, w=w, h=h, inliers=inlier_mask)


def test_fundamental_8pt_exact(rng):
    s = synth_two_view(rng, n=16)
    F = geometry.fit_fundamental_8pt(jnp.asarray(s["uv1"])[None],
                                     jnp.asarray(s["uv2"])[None])
    r = geometry.epipolar_dist_f(F, jnp.asarray(s["uv1"])[None],
                                 jnp.asarray(s["uv2"])[None])
    assert float(jnp.max(r)) < 1e-4


def test_homography_4pt_exact(rng):
    Ht = np.array([[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
    x1 = rng.uniform(0, 500, size=(12, 2))
    x1h = np.concatenate([x1, np.ones((12, 1))], 1)
    x2h = (Ht @ x1h.T).T
    x2 = x2h[:, :2] / x2h[:, 2:]
    H = geometry.fit_homography_4pt(jnp.asarray(x1)[None],
                                    jnp.asarray(x2)[None])
    r = geometry.sym_transfer_h(H, jnp.asarray(x1)[None],
                                jnp.asarray(x2)[None])
    assert float(jnp.max(r)) < 1e-5


def test_essential_decomposition_recovers_pose(rng):
    s = synth_two_view(rng, n=64)
    E = geometry.fit_essential_8pt(jnp.asarray(s["xn1"])[None],
                                   jnp.asarray(s["xn2"])[None])
    R, t, ngood = geometry.decompose_essential(
        E, jnp.asarray(s["xn1"])[None], jnp.asarray(s["xn2"])[None])
    assert int(ngood[0]) == 64
    np.testing.assert_allclose(np.asarray(R[0]), s["R2"], atol=1e-3)
    # translation direction (up to scale)
    t_true = -s["R2"] @ s["C2"]
    t_true /= np.linalg.norm(t_true)
    t_got = np.asarray(t[0])
    assert min(np.linalg.norm(t_got - t_true),
               np.linalg.norm(t_got + t_true)) < 1e-2


def test_triangulate_2view_exact(rng):
    s = synth_two_view(rng, n=32)
    b1 = geometry.to_h(jnp.asarray(s["xn1"]))
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = geometry.to_h(jnp.asarray(s["xn2"]))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    X = geometry.triangulate_2view(jnp.eye(3), jnp.zeros(3),
                                   jnp.asarray(s["R2"]), jnp.asarray(s["C2"]),
                                   b1, b2)
    np.testing.assert_allclose(np.asarray(X), s["X"], atol=1e-3)


def test_triangulate_nview(rng):
    s = synth_two_view(rng, n=8)
    # use 2 views stacked into V=4 with 2 masked out
    b1 = geometry.to_h(jnp.asarray(s["xn1"]))
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = geometry.to_h(jnp.asarray(s["xn2"]))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    R = jnp.stack([jnp.eye(3), jnp.asarray(s["R2"]), jnp.eye(3), jnp.eye(3)])
    C = jnp.stack([jnp.zeros(3), jnp.asarray(s["C2"]), jnp.zeros(3), jnp.zeros(3)])
    for i in range(8):
        b = jnp.stack([b1[i], b2[i], jnp.zeros(3), jnp.zeros(3)])
        mask = jnp.array([True, True, False, False])
        X, ok = geometry.triangulate_nview(R, C, b, mask)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(X), s["X"][i], atol=1e-3)


def test_resection_dlt_exact(rng):
    s = synth_two_view(rng, n=32)
    R, C, ok = geometry.resection_dlt(jnp.asarray(s["X"])[None],
                                      jnp.asarray(s["xn2"])[None])
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(R[0]), s["R2"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(C[0]), s["C2"], atol=1e-2)


def test_acransac_f_with_outliers(rng):
    s = synth_two_view(rng, n=256, noise=0.5, outlier_frac=0.3)
    key = jax.random.PRNGKey(0)
    res = ransac.acransac_f(key, jnp.asarray(s["uv1"], jnp.float32),
                            jnp.asarray(s["uv2"], jnp.float32),
                            jnp.ones((256,), bool), s["w"], s["h"],
                            iters=512)
    assert bool(res.valid)
    inl = np.asarray(res.inliers)
    true = s["inliers"]
    # recall: most true inliers found; precision: few outliers admitted
    assert (inl & true).sum() > 0.9 * true.sum()
    assert (inl & ~true).sum() < 0.05 * (~true).sum() + 3


@pytest.mark.medium
def test_acransac_e_with_outliers(rng):
    s = synth_two_view(rng, n=256, noise=0.5, outlier_frac=0.3)
    key = jax.random.PRNGKey(1)
    res = ransac.acransac_e(key, jnp.asarray(s["xn1"], jnp.float32),
                            jnp.asarray(s["xn2"], jnp.float32),
                            jnp.ones((256,), bool), focal_px=s["f"],
                            iters=512)
    assert bool(res.valid)
    inl = np.asarray(res.inliers)
    true = s["inliers"]
    assert (inl & true).sum() > 0.9 * true.sum()
    # pose from the robust E
    R, t, ngood = geometry.decompose_essential(
        res.model[None], jnp.asarray(s["xn1"][true])[None],
        jnp.asarray(s["xn2"][true])[None])
    np.testing.assert_allclose(np.asarray(R[0]), s["R2"], atol=0.02)


def test_acransac_h_rejects_general_scene(rng):
    """A non-planar scene should give H far fewer inliers than F."""
    s = synth_two_view(rng, n=256, noise=0.5)
    key = jax.random.PRNGKey(2)
    resH = ransac.acransac_h(key, jnp.asarray(s["uv1"], jnp.float32),
                             jnp.asarray(s["uv2"], jnp.float32),
                             jnp.ones((256,), bool), s["w"], s["h"],
                             iters=256)
    resF = ransac.acransac_f(key, jnp.asarray(s["uv1"], jnp.float32),
                             jnp.asarray(s["uv2"], jnp.float32),
                             jnp.ones((256,), bool), s["w"], s["h"],
                             iters=256)
    assert int(resF.num_inliers) > 2 * int(resH.num_inliers)


def test_acransac_resection_with_outliers(rng):
    s = synth_two_view(rng, n=200, noise=0.5)
    xn = s["xn2"].copy()
    out = rng.choice(200, 60, replace=False)
    xn[out] += rng.uniform(0.05, 0.3, size=(60, 2))
    key = jax.random.PRNGKey(3)
    res = ransac.acransac_resection(key, jnp.asarray(s["X"], jnp.float32),
                                    jnp.asarray(xn, jnp.float32),
                                    jnp.ones((200,), bool),
                                    focal_px=s["f"], iters=512)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.R), s["R2"], atol=0.02)
    np.testing.assert_allclose(np.asarray(res.C), s["C2"], atol=0.1)


def test_ransac_degenerate_all_outliers(rng):
    """Pure noise: the filter must not report a confident model."""
    uv1 = jnp.asarray(rng.uniform(0, 1000, size=(128, 2)), jnp.float32)
    uv2 = jnp.asarray(rng.uniform(0, 1000, size=(128, 2)), jnp.float32)
    key = jax.random.PRNGKey(4)
    res = ransac.acransac_f(key, uv1, uv2, jnp.ones((128,), bool),
                            1000, 1000, iters=256)
    # either invalid or only a tiny "inlier" set
    assert (not bool(res.valid)) or int(res.num_inliers) < 30
