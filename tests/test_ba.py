import jax
import jax.numpy as jnp
import numpy as np

from regard3d_tpu.ba import lm
from regard3d_tpu.core import cameras
from regard3d_tpu.core.types import PINHOLE, RADIAL_K3


def synth_ba_problem(rng, n_cams=6, n_pts=120, noise_px=0.5,
                     perturb_pose=0.02, perturb_pts=0.05,
                     model=PINHOLE, d=(0, 0, 0, 0, 0, 0), f=900.0):
    """Cameras on an arc around a point cloud; GT + perturbed init."""
    X = rng.normal(size=(n_pts, 3)).astype(np.float64) * [2, 1.5, 1] + [0, 0, 8]
    Rs, Cs = [], []
    for i in range(n_cams):
        a = -0.3 + 0.6 * i / max(n_cams - 1, 1)
        R = np.asarray(cameras.exp_so3(jnp.asarray([0.0, a, 0.0])))
        C = np.array([np.sin(a) * -8.0, 0.3 * rng.normal(),
                      8.0 - np.cos(a) * 8.0])
        Rs.append(R)
        Cs.append(C)
    Rs = np.stack(Rs)
    Cs = np.stack(Cs)
    intr = np.zeros((1, 9))
    intr[0, :3] = [f, 640.0, 480.0]
    intr[0, 3:] = d

    # observations: all points in all cameras
    view_id, pt_id, xys = [], [], []
    for v in range(n_cams):
        uv, depth = cameras.project(jnp.asarray(Rs[v]), jnp.asarray(Cs[v]),
                                    jnp.int32(model), jnp.asarray(intr[0]),
                                    jnp.asarray(X))
        uv = np.asarray(uv) + rng.normal(size=(n_pts, 2)) * noise_px
        view_id += [v] * n_pts
        pt_id += list(range(n_pts))
        xys.append(uv)
    O = n_cams * n_pts
    obs = lm.BAObservations(
        view_id=jnp.asarray(view_id, jnp.int32),
        intr_id=jnp.zeros((O,), jnp.int32),
        point_id=jnp.asarray(pt_id, jnp.int32),
        model=jnp.full((O,), model, jnp.int32),
        xy=jnp.asarray(np.concatenate(xys), jnp.float32),
        weight=jnp.ones((O,), jnp.float32),
    )

    # perturbed initialization (keep cam 0 exact: it is gauge-fixed)
    Rp = Rs.copy()
    Cp = Cs.copy()
    for v in range(1, n_cams):
        Rp[v] = np.asarray(cameras.exp_so3(
            jnp.asarray(rng.normal(size=3) * perturb_pose))) @ Rs[v]
        Cp[v] = Cs[v] + rng.normal(size=3) * perturb_pts
    Xp = X + rng.normal(size=X.shape) * perturb_pts

    state = lm.BAState(
        R=jnp.asarray(Rp, jnp.float32), C=jnp.asarray(Cp, jnp.float32),
        intr=jnp.asarray(intr, jnp.float32), X=jnp.asarray(Xp, jnp.float32))
    gt = lm.BAState(
        R=jnp.asarray(Rs, jnp.float32), C=jnp.asarray(Cs, jnp.float32),
        intr=jnp.asarray(intr, jnp.float32), X=jnp.asarray(X, jnp.float32))
    return state, gt, obs


def rms_px(state, obs):
    r = lm.compute_residuals(state, obs)
    return float(jnp.sqrt(jnp.mean(jnp.sum(r * r, -1))))


def test_ba_converges_pinhole(rng):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    assert rms_px(state, obs) > 5.0          # perturbed start is bad
    opts = lm.BAOptions(max_iterations=25)
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, stats = lm.bundle_adjust(state, obs, opts, fixed_pose_mask=fixed)
    final = rms_px(out, obs)
    assert final < 0.05, (stats, final)
    assert float(stats.final_cost) < float(stats.initial_cost) * 1e-4


def test_ba_with_noise_reaches_noise_floor(rng):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.5)
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, stats = lm.bundle_adjust(state, obs, lm.BAOptions(max_iterations=25),
                                  fixed_pose_mask=fixed)
    final = rms_px(out, obs)
    # noise floor ~= noise_px (cannot do better than the measurement noise)
    assert final < 0.8, final
    # recovered rotations close to GT
    dR = np.asarray(out.R[1] @ gt.R[1].T)
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang


def test_ba_radial_k3_distortion(rng):
    state, gt, obs = synth_ba_problem(rng, model=RADIAL_K3,
                                      d=(-0.15, 0.03, -0.005, 0, 0, 0))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, stats = lm.bundle_adjust(state, obs, lm.BAOptions(max_iterations=25),
                                  fixed_pose_mask=fixed)
    assert rms_px(out, obs) < 0.9


def test_ba_refine_intrinsics(rng):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    # corrupt the focal by 2%; BA with intrinsic refinement must recover it
    state = state._replace(intr=state.intr.at[0, 0].multiply(1.02))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    opts = lm.BAOptions(max_iterations=40, refine_intrinsics=True)
    out, stats = lm.bundle_adjust(state, obs, opts, fixed_pose_mask=fixed)
    f_rec = float(out.intr[0, 0])
    assert abs(f_rec - 900.0) / 900.0 < 0.005, f_rec
    assert rms_px(out, obs) < 0.1


def test_ba_huber_resists_outliers(rng):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.3)
    # corrupt 5% of observations grossly
    xy = np.asarray(obs.xy).copy()
    n_out = int(0.05 * xy.shape[0])
    idx = rng.choice(xy.shape[0], n_out, replace=False)
    xy[idx] += rng.uniform(80, 300, size=(n_out, 2))
    obs = obs._replace(xy=jnp.asarray(xy))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, _ = lm.bundle_adjust(
        state, obs, lm.BAOptions(max_iterations=30, huber_delta_px=2.0),
        fixed_pose_mask=fixed)
    # engine-style outlier rejection between BA rounds (OpenMVG's
    # badTrackRejector drops observations above the residual bound)
    r = np.asarray(lm.compute_residuals(out, obs))
    bad = (r ** 2).sum(-1) > 16.0
    obs2 = obs._replace(weight=obs.weight * jnp.asarray(~bad))
    out, _ = lm.bundle_adjust(
        out, obs2, lm.BAOptions(max_iterations=20, huber_delta_px=2.0),
        fixed_pose_mask=fixed)
    # the rejector must catch the gross outliers with few false rejects...
    assert bad[idx].mean() > 0.95
    truly_in = ~np.isin(np.arange(len(bad)), idx)
    assert bad[truly_in].mean() < 0.02
    # ...and the active (surviving) observations reach the noise floor
    r = np.asarray(lm.compute_residuals(out, obs))
    act = np.asarray(obs2.weight) > 0
    rms_active = np.sqrt((r[act] ** 2).sum(-1).mean())
    assert rms_active < 0.6, rms_active


def test_ba_fixed_poses_stay_fixed(rng):
    state, gt, obs = synth_ba_problem(rng)
    fixed = jnp.zeros((6,), bool).at[0].set(True).at[1].set(True)
    out, _ = lm.bundle_adjust(state, obs, lm.BAOptions(max_iterations=10),
                              fixed_pose_mask=fixed)
    np.testing.assert_allclose(np.asarray(out.R[:2]), np.asarray(state.R[:2]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.C[:2]), np.asarray(state.C[:2]),
                               atol=1e-6)


def test_ba_masked_observations_ignored(rng):
    state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
    # poison some observations but give them zero weight
    xy = np.asarray(obs.xy).copy()
    xy[:50] += 1000.0
    w = np.asarray(obs.weight).copy()
    w[:50] = 0.0
    obs = obs._replace(xy=jnp.asarray(xy), weight=jnp.asarray(w))
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    out, stats = lm.bundle_adjust(state, obs, lm.BAOptions(max_iterations=20),
                                  fixed_pose_mask=fixed)
    r = np.asarray(lm.compute_residuals(out, obs))
    rms_live = np.sqrt((r[50:] ** 2).sum(-1).mean())
    assert rms_live < 0.05


def test_layout_reductions_match_segment_sum(rng):
    """Gather-layout fast path must agree with the scatter path."""
    state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=40, noise_px=0.2)
    layout = lm.make_layout(obs, 5, 40, 1)
    assert layout is not None
    nb1 = lm._normal_blocks(state, obs, lm.BAOptions())
    nb2 = lm._normal_blocks(state, obs, lm.BAOptions(), layout=layout)
    # f32 summation order differs between scatter and gather paths
    np.testing.assert_allclose(np.asarray(nb1.U), np.asarray(nb2.U),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(nb1.Vl), np.asarray(nb2.Vl),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(nb1.gc), np.asarray(nb2.gc),
                               rtol=5e-4, atol=1e-2)
    # a full trial step agrees too
    fixed = jnp.zeros((5,), bool).at[0].set(True)
    imask = jnp.zeros((1, 9), bool)
    s1 = lm.lm_trial(state, jnp.float32(1e-3), obs, lm.BAOptions(),
                     fixed, imask)
    s2 = lm.lm_trial(state, jnp.float32(1e-3), obs, lm.BAOptions(),
                     fixed, imask, layout=layout)
    np.testing.assert_allclose(np.asarray(s1.C), np.asarray(s2.C),
                               rtol=1e-3, atol=1e-3)


def test_layout_falls_back_on_skew(rng):
    """A pathologically skewed distribution (one camera sees everything)
    must return None (padding blow-up guard)."""
    state, gt, obs = synth_ba_problem(rng, n_cams=6, n_pts=120)
    vid = np.asarray(obs.view_id).copy()
    vid[:600] = 0                     # camera 0 hogs most observations
    vid[600:] = np.arange(120)[: len(vid) - 600] % 6
    obs2 = obs._replace(view_id=jnp.asarray(vid))
    assert lm.make_layout(obs2, 6, 120, 1, max_pad_factor=2.0) is None


def test_ba_f64_islands(rng):
    # SURVEY §7 hard part 5: Ceres runs double; the --f64 switch runs the
    # whole LM/Schur pipeline in float64 for ATE-parity experiments.
    jax.config.update("jax_enable_x64", True)
    try:
        state, gt, obs = synth_ba_problem(rng, noise_px=0.0)
        state = lm.BAState(*(jnp.asarray(x, jnp.float64) for x in state))
        obs = obs._replace(xy=jnp.asarray(obs.xy, jnp.float64),
                           weight=jnp.asarray(obs.weight, jnp.float64))
        fixed = jnp.zeros((state.R.shape[0],), bool).at[0].set(True)
        out, stats = lm.bundle_adjust(
            state, obs, lm.BAOptions(max_iterations=25),
            fixed_pose_mask=fixed)
        assert out.X.dtype == jnp.float64
        assert float(stats.final_cost) < float(stats.initial_cost)
        # noiseless problem in f64 should reach a much deeper floor than f32
        assert rms_px(out, obs) < 1e-4
    finally:
        jax.config.update("jax_enable_x64", False)


def test_ba_cg_tol_early_stop_matches_full(rng):
    # the relative CG stop must not change the solution materially
    state, gt, obs = synth_ba_problem(rng)
    fixed = jnp.zeros((state.R.shape[0],), bool).at[0].set(True)
    out_a, _ = lm.bundle_adjust(
        state, obs, lm.BAOptions(max_iterations=10, cg_tol=0.0),
        fixed_pose_mask=fixed)
    out_b, _ = lm.bundle_adjust(
        state, obs, lm.BAOptions(max_iterations=10, cg_tol=1e-6),
        fixed_pose_mask=fixed)
    assert abs(rms_px(out_a, obs) - rms_px(out_b, obs)) < 0.05


def test_ba_degenerate_masked_rows_do_not_poison(rng):
    # a zero-weight observation of a point sitting AT a camera center
    # (zero depth -> non-finite projection) must not NaN-poison the cost
    # or the normal equations (this killed incremental SfM on scenes with
    # untriangulated tracks at the origin)
    state, gt, obs = synth_ba_problem(rng, n_cams=4, n_pts=50)
    X = np.array(state.X)
    X[0] = np.asarray(state.C)[0]          # exactly at camera 0's center
    state = state._replace(X=jnp.asarray(X, jnp.float32))
    w = np.array(obs.weight)
    w[np.asarray(obs.point_id) == 0] = 0.0
    obs = obs._replace(weight=jnp.asarray(w, jnp.float32))
    cost = lm.compute_cost(state, obs, lm.BAOptions())
    assert np.isfinite(float(cost))
    fixed = jnp.zeros((4,), bool).at[0].set(True)
    out, stats = lm.bundle_adjust(state, obs,
                                  lm.BAOptions(max_iterations=5),
                                  fixed_pose_mask=fixed)
    assert np.isfinite(float(stats.final_cost))
    assert float(stats.final_cost) <= float(stats.initial_cost)
