import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.ba import lm, sharded
from regard3d_tpu.dist import mesh as meshlib

from tests.test_ba import rms_px, synth_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, jax.devices()
    return meshlib.make_mesh("obs")


def test_sharded_matches_single_device(rng, mesh8):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    opts = lm.BAOptions(max_iterations=15)
    out_s, st_s = sharded.bundle_adjust_sharded(state, obs, mesh8, opts,
                                                fixed_pose_mask=fixed)
    out_1, st_1 = lm.bundle_adjust(state, obs, opts, fixed_pose_mask=fixed)
    # both converge to the same solution (psum order may differ slightly)
    assert rms_px(out_s, obs) < 0.05
    assert rms_px(out_1, obs) < 0.05
    np.testing.assert_allclose(np.asarray(out_s.C), np.asarray(out_1.C),
                               atol=1e-2)


def test_sharded_uneven_observations(rng, mesh8):
    # observation count NOT divisible by 8 exercises the padding path
    state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=101, noise_px=0.0)
    fixed = jnp.zeros((5,), bool).at[0].set(True)
    out, stats = sharded.bundle_adjust_sharded(
        state, obs, mesh8, lm.BAOptions(max_iterations=15),
        fixed_pose_mask=fixed)
    assert rms_px(out, obs) < 0.05
    assert (5 * 101) % 8 != 0  # sanity: this really was uneven


def test_sharded_with_intrinsics_refinement(rng, mesh8):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    state = state._replace(intr=state.intr.at[0, 0].multiply(1.02))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, _ = sharded.bundle_adjust_sharded(
        state, obs, mesh8,
        lm.BAOptions(max_iterations=40, refine_intrinsics=True),
        fixed_pose_mask=fixed)
    assert abs(float(out.intr[0, 0]) - 900.0) / 900.0 < 0.005
