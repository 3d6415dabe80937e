import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras
from regard3d_tpu.core.types import (BROWN_T2, FISHEYE, PINHOLE, RADIAL_K1,
                                     RADIAL_K3)


def make_params(f=1000.0, cx=640.0, cy=480.0, d=(0, 0, 0, 0, 0, 0)):
    return jnp.array([f, cx, cy, *d], jnp.float32)


def test_exp_log_so3_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)) * 1.5, jnp.float32)
    R = cameras.exp_so3(w)
    # orthonormality
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    w2 = cameras.log_so3(R)
    R2 = cameras.exp_so3(w2)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_exp_so3_zero():
    R = cameras.exp_so3(jnp.zeros((3,)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


@pytest.mark.parametrize("model,d", [
    (PINHOLE, (0, 0, 0, 0, 0, 0)),
    (RADIAL_K1, (-0.1, 0, 0, 0, 0, 0)),
    (RADIAL_K3, (-0.2, 0.05, -0.01, 0, 0, 0)),
    (BROWN_T2, (-0.2, 0.05, -0.01, 1e-3, -2e-3, 0)),
    (FISHEYE, (-0.05, 0.01, -0.002, 1e-4, 0, 0)),
])
def test_disto_roundtrip(model, d, rng):
    params = make_params(d=d)
    xu = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 2)), jnp.float32)
    model_arr = jnp.full((256,), model, jnp.int32)
    xd = cameras.add_disto(model_arr, params, xu)
    xu2 = cameras.remove_disto(model_arr, params, xd, iters=20)
    np.testing.assert_allclose(xu, xu2, atol=2e-4)


def test_project_center_point():
    params = make_params()
    R = jnp.eye(3)
    C = jnp.zeros(3)
    X = jnp.array([0.0, 0.0, 5.0])
    uv, depth = cameras.project(R, C, jnp.int32(PINHOLE), params, X)
    np.testing.assert_allclose(uv, [640.0, 480.0], atol=1e-4)
    np.testing.assert_allclose(depth, 5.0)


def test_project_batched_consistency(rng):
    params = make_params(d=(-0.2, 0.05, -0.01, 0, 0, 0))
    w = jnp.asarray(rng.normal(size=(3,)) * 0.2, jnp.float32)
    R = cameras.exp_so3(w)
    C = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(100, 3)) + np.array([0, 0, 10.0]),
                    jnp.float32)
    model = jnp.int32(RADIAL_K3)
    uv, depth = cameras.project(R, C, model, params, X)
    assert uv.shape == (100, 2)
    assert bool(jnp.all(depth > 0))
    # residual of the projecting point is zero
    r = cameras.reprojection_residual(R, C, model, params, X, uv)
    np.testing.assert_allclose(r, 0.0, atol=1e-5)


def test_bearing_inverts_projection(rng):
    params = make_params(d=(-0.1, 0.02, 0, 0, 0, 0))
    model = jnp.int32(RADIAL_K3)
    X = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    X = X.at[:, 2].set(jnp.abs(X[:, 2]) + 2.0)
    R = jnp.eye(3)
    C = jnp.zeros(3)
    uv, _ = cameras.project(R, C, model, params, X)
    b = cameras.bearing(model, params, uv, iters=20)
    Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    np.testing.assert_allclose(b, Xn, atol=1e-3)


def test_undistort_pixel_roundtrip(rng):
    params = make_params(d=(-0.2, 0.05, -0.01, 0, 0, 0))
    model = jnp.int32(RADIAL_K3)
    uv = jnp.asarray(rng.uniform(100, 900, size=(64, 2)), jnp.float32)
    und = cameras.undistort_pixel(model, params, uv, iters=20)
    back = cameras.distort_pixel(model, params, und)
    np.testing.assert_allclose(uv, back, atol=0.05)


def test_grad_flows_through_projection():
    params = make_params(d=(-0.1, 0, 0, 0, 0, 0))
    model = jnp.int32(RADIAL_K3)

    def loss(w, C, X):
        R = cameras.exp_so3(w)
        uv, _ = cameras.project(R, C, model, params, X)
        return jnp.sum(uv ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array([0.1, -0.2, 0.05]), jnp.array([0.0, 0.0, -1.0]),
        jnp.array([0.3, -0.1, 4.0]))
    for gi in g:
        assert bool(jnp.all(jnp.isfinite(gi)))
