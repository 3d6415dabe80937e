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


# ---------------------------------------------------------------------------
# Point-block-sharded path (landmarks partitioned over the mesh)
# ---------------------------------------------------------------------------

def test_point_sharded_matches_single_device(rng, mesh8):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    opts = lm.BAOptions(max_iterations=15)
    out_s, st_s = sharded.bundle_adjust_point_sharded(
        state, obs, mesh8, opts, fixed_pose_mask=fixed)
    out_1, st_1 = lm.bundle_adjust(state, obs, opts, fixed_pose_mask=fixed)
    assert rms_px(out_s, obs) < 0.05
    assert rms_px(out_1, obs) < 0.05
    np.testing.assert_allclose(np.asarray(out_s.C), np.asarray(out_1.C),
                               atol=1e-2)
    # X is permuted to device blocks internally — must come back in the
    # caller's numbering
    np.testing.assert_allclose(np.asarray(out_s.X), np.asarray(out_1.X),
                               atol=5e-2)


def test_point_sharded_uneven(rng, mesh8):
    # point count and obs count NOT divisible by 8
    state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=101, noise_px=0.0)
    fixed = jnp.zeros((5,), bool).at[0].set(True)
    out, stats = sharded.bundle_adjust_point_sharded(
        state, obs, mesh8, lm.BAOptions(max_iterations=15),
        fixed_pose_mask=fixed)
    assert rms_px(out, obs) < 0.05


def test_point_sharded_intrinsics_refinement(rng, mesh8):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    state = state._replace(intr=state.intr.at[0, 0].multiply(1.02))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, _ = sharded.bundle_adjust_point_sharded(
        state, obs, mesh8,
        lm.BAOptions(max_iterations=40, refine_intrinsics=True),
        fixed_pose_mask=fixed)
    assert abs(float(out.intr[0, 0]) - 900.0) / 900.0 < 0.005


def test_point_partition_roundtrip(rng, mesh8):
    """Partition invariants: every obs row lands on its point's device,
    padding rows carry zero weight, X block unpermutes exactly."""
    from regard3d_tpu.ba.sharded import partition_by_point
    state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=97)
    part = partition_by_point(obs, state.X, 8)
    assert part.obs.weight.shape[0] == 8 * part.Omax
    # live rows' local point ids are within the local block
    w = np.asarray(part.obs.weight).reshape(8, part.Omax)
    lp = np.asarray(part.obs.point_id).reshape(8, part.Omax)
    assert (lp[w > 0] < part.Lloc).all()
    # weight-preserving: total live rows match
    assert int((w > 0).sum()) == obs.weight.shape[0]
    # X roundtrip
    Xp = np.asarray(part.X)
    live = part.global_of_slot >= 0
    X2 = np.zeros_like(np.asarray(state.X))
    X2[part.global_of_slot[live]] = Xp[live]
    np.testing.assert_array_equal(X2, np.asarray(state.X))
