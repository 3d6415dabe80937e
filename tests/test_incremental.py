import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras, metrics
from regard3d_tpu.core.types import RADIAL_K3, PINHOLE
from regard3d_tpu.sfm import incremental, tracks


def synth_scene(rng, n_cams=8, n_pts=300, noise_px=0.4, f=900.0,
                w=1280, h=960, model=PINHOLE, d=(0, 0, 0, 0, 0, 0),
                visibility=0.8, match_outlier_frac=0.0):
    """Cameras on an arc; per-view feature lists; GT pairwise matches."""
    X = rng.normal(size=(n_pts, 3)) * [3, 2, 1.2] + [0, 0, 10]
    Rs, Cs = [], []
    for i in range(n_cams):
        a = -0.5 + 1.0 * i / (n_cams - 1)
        R = np.asarray(cameras.exp_so3(jnp.asarray([0.0, a, 0.02 * i])))
        C = np.array([-10 * np.sin(a), 0.2 * rng.normal(), 10 - 10 * np.cos(a)])
        Rs.append(R)
        Cs.append(C)
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [f, w / 2, h / 2]
    intr[0, 3:] = d

    feats = []          # per view: (feature_idx -> point id, uv)
    vis_table = {}      # (view, point) -> feature idx
    for v in range(n_cams):
        uv, depth = cameras.project(jnp.asarray(Rs[v]), jnp.asarray(Cs[v]),
                                    jnp.int32(model), jnp.asarray(intr[0]),
                                    jnp.asarray(X))
        uv = np.asarray(uv) + rng.normal(size=(n_pts, 2)) * noise_px
        inside = ((uv[:, 0] > 0) & (uv[:, 0] < w)
                  & (uv[:, 1] > 0) & (uv[:, 1] < h)
                  & (np.asarray(depth) > 0))
        seen = inside & (rng.uniform(size=n_pts) < visibility)
        ids = np.where(seen)[0]
        feats.append((ids, uv[ids]))
        for fidx, pid in enumerate(ids):
            vis_table[(v, pid)] = fidx

    matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            pi = dict((pid, k) for k, pid in enumerate(feats[i][0]))
            m = []
            for k, pid in enumerate(feats[j][0]):
                if pid in pi:
                    m.append((pi[pid], k))
            m = np.asarray(m, np.int64)
            if match_outlier_frac > 0 and len(m) > 10:
                n_bad = int(len(m) * match_outlier_frac)
                bad_rows = rng.choice(len(m), n_bad, replace=False)
                m[bad_rows, 1] = rng.integers(0, len(feats[j][0]), n_bad)
            if len(m) >= 8:
                matches[(i, j)] = m
    return dict(X=X, Rs=np.stack(Rs), Cs=np.stack(Cs), intr=intr,
                feats=feats, matches=matches, model=model, w=w, h=h)


def build_inputs(scene):
    table = tracks.build_tracks(scene["matches"])
    xy = np.zeros((len(table.track_id), 2), np.float32)
    for o in range(len(table.track_id)):
        v = table.view_id[o]
        xy[o] = scene["feats"][v][1][table.feature_id[o]]
    V = len(scene["feats"])
    inputs = incremental.SfMInputs(
        xy=jnp.asarray(xy),
        track_id=jnp.asarray(table.track_id),
        view_id=jnp.asarray(table.view_id),
        feature_id=jnp.asarray(table.feature_id),
        num_tracks=table.num_tracks,
        intr_id=jnp.zeros((V,), jnp.int32),
        intr=jnp.asarray(scene["intr"]),
        models=jnp.asarray([scene["model"]], jnp.int32),
        image_sizes=np.tile([[scene["w"], scene["h"]]], (V, 1)),
    )
    return inputs, table


def test_tracks_builder_basic():
    matches = {(0, 1): np.array([[0, 5], [1, 6]]),
               (1, 2): np.array([[5, 9]]),
               (0, 2): np.array([[3, 2]])}
    t = tracks.build_tracks(matches)
    # track A: (0,0)-(1,5)-(2,9); track B: (0,1)-(1,6); track C: (0,3)-(2,2)
    assert t.num_tracks == 3
    lengths = sorted(t.lengths().tolist())
    assert lengths == [2, 2, 3]


def test_tracks_builder_drops_inconsistent():
    # feature 0 of view 0 matches two different features of view 1 and those
    # merge into one track containing view1 twice -> dropped
    matches = {(0, 1): np.array([[0, 5], [0, 6]])}
    t = tracks.build_tracks(matches)
    assert t.num_tracks == 0


def test_tracks_builder_scales(rng):
    # chain matches over 50 views, 2000 features each
    matches = {}
    for v in range(49):
        ids = np.arange(2000)
        matches[(v, v + 1)] = np.stack([ids, ids], 1)
    t = tracks.build_tracks(matches)
    assert t.num_tracks == 2000
    assert (t.lengths() == 50).all()


def test_incremental_full_scene(rng):
    scene = synth_scene(rng)
    inputs, table = build_inputs(scene)
    result = incremental.run_incremental(
        inputs, initial_pair=(3, 4),
        cfg=incremental.IncrementalConfig(ransac_iters=512,
                                          resection_iters=256))
    assert result.stats["num_cameras"] == 8, result.stats
    assert result.stats["rms_px"] < 1.0, result.stats
    ate = metrics.ate_rmse(np.asarray(result.C), scene["Cs"])
    assert ate < 0.05, ate  # scene scale ~10


@pytest.mark.medium
def test_incremental_auto_initial_pair(rng):
    scene = synth_scene(rng, n_cams=6)
    inputs, table = build_inputs(scene)
    result = incremental.run_incremental(
        inputs, initial_pair=None,
        cfg=incremental.IncrementalConfig(ransac_iters=512,
                                          resection_iters=256))
    assert result.stats["num_cameras"] == 6
    ate = metrics.ate_rmse(np.asarray(result.C), scene["Cs"])
    assert ate < 0.05, ate


@pytest.mark.medium
def test_incremental_with_match_outliers(rng):
    scene = synth_scene(rng, match_outlier_frac=0.1)
    inputs, table = build_inputs(scene)
    result = incremental.run_incremental(
        inputs, initial_pair=(3, 4),
        cfg=incremental.IncrementalConfig(ransac_iters=512,
                                          resection_iters=256))
    # NB: raw 10% match corruption reaches the track builder here (the real
    # pipeline pre-filters with ACRANSAC), merging/dropping many tracks and
    # starving the weak end views — most cameras must still pose accurately
    assert result.stats["num_cameras"] >= 6
    ate = metrics.ate_rmse(np.asarray(result.C[result.pose_mask]),
                           scene["Cs"][result.pose_mask])
    assert ate < 0.1, ate


@pytest.mark.medium
def test_incremental_radial_distortion(rng):
    scene = synth_scene(rng, model=RADIAL_K3, d=(-0.12, 0.02, 0, 0, 0, 0))
    inputs, table = build_inputs(scene)
    result = incremental.run_incremental(
        inputs, initial_pair=(3, 4),
        cfg=incremental.IncrementalConfig(ransac_iters=512,
                                          resection_iters=256))
    assert result.stats["num_cameras"] == 8
    assert result.stats["rms_px"] < 1.2, result.stats


def test_umeyama_alignment(rng):
    A = rng.normal(size=(20, 3))
    R = np.asarray(cameras.exp_so3(jnp.asarray([0.2, -0.4, 0.7])))
    B = 2.5 * A @ R.T + np.array([1, 2, 3])
    sim = metrics.umeyama(A, B)
    np.testing.assert_allclose(sim.scale, 2.5, rtol=1e-6)
    np.testing.assert_allclose(sim.apply(A), B, atol=1e-5)
    assert metrics.ate_rmse(A, B) < 1e-5


@pytest.mark.medium
def test_incremental_gps_anchoring(rng):
    """With center priors, the reconstruction comes back in the metric
    prior frame (no Sim3 alignment needed for the ATE check)."""
    scene = synth_scene(rng, n_cams=6)
    inputs, table = build_inputs(scene)
    # priors: ground-truth centers + 0.05 noise (a "good GPS")
    priors = scene["Cs"] + rng.normal(size=scene["Cs"].shape) * 0.05
    result = incremental.run_incremental(
        inputs, initial_pair=(2, 3),
        cfg=incremental.IncrementalConfig(ransac_iters=512,
                                          resection_iters=256),
        center_priors=priors, prior_weight=1.0)
    assert result.stats["num_cameras"] == 6
    # direct (unaligned) error against GT must be at prior-noise level
    err = np.linalg.norm(np.asarray(result.C) - scene["Cs"], axis=1)
    assert err.mean() < 0.15, err


def test_covisibility_pairs_sparse(rng):
    scene = synth_scene(rng, n_cams=6, n_pts=150)
    inputs, table = build_inputs(scene)
    dense = tracks.shared_track_count(table, 6)
    pairs, counts = tracks.covisibility_pairs(table, 6)
    got = {(int(i), int(j)): int(c) for (i, j), c in zip(pairs, counts)}
    for i in range(6):
        for j in range(i + 1, 6):
            assert got.get((i, j), 0) == dense[i, j]
    # sorted descending
    assert all(counts[k] >= counts[k + 1] for k in range(len(counts) - 1))


@pytest.mark.medium
def test_stellar_seed_poses(rng):
    # the stellar initializer must seed a multi-view pod around the hub
    # whose poses match GT after Sim3 alignment
    scene = synth_scene(rng, n_cams=8, n_pts=400, noise_px=0.3)
    inputs, table = build_inputs(scene)
    import jax
    xn = np.asarray(incremental._normalized_xy(inputs, inputs.intr))
    cfg = incremental.IncrementalConfig(initializer="stellar")
    seed = incremental._stellar_seed(inputs, table, jax.random.PRNGKey(0),
                                     cfg, 8, xn)
    assert seed is not None
    hub, poses, deact = seed
    assert len(poses) >= 3            # hub + >=2 branches
    views = sorted(poses)
    C_est = np.stack([poses[v][1] for v in views])
    C_gt = scene["Cs"][views]
    ate = metrics.ate_rmse(C_est, C_gt)
    assert ate < 0.5, ate             # scene scale ~10; seed-level accuracy


@pytest.mark.medium
def test_incremental_stellar_full_scene(rng):
    scene = synth_scene(rng, n_cams=8, n_pts=400, noise_px=0.3)
    inputs, table = build_inputs(scene)
    res = incremental.run_incremental(
        inputs, cfg=incremental.IncrementalConfig(initializer="stellar"))
    assert res.pose_mask.sum() == 8
    assert res.stats["rms_px"] < 1.0
    ate = metrics.ate_rmse(np.asarray(res.C), scene["Cs"])
    assert ate < 0.1, ate


def corridor_scene(rng, n_cams=150, n_pts=12000, f=800.0, w=1000, h=1000,
                   window=5.0, noise_px=0.4):
    """City-walk-style scene: cameras dolly along a corridor, each seeing
    only a local window of points — local visibility like Tanks&Temples /
    Rome16K sequences.  Builds SfMInputs directly (no pairwise match
    materialization), so the test scales to hundreds of views."""
    span = 60.0
    X = np.stack([rng.uniform(0, span, n_pts),
                  rng.normal(size=n_pts) * 2.5,
                  8.0 + rng.normal(size=n_pts) * 1.2], -1)
    cx = np.linspace(0, span, n_cams)
    Rs = np.tile(np.eye(3), (n_cams, 1, 1))
    Cs = np.stack([cx, 0.05 * rng.normal(size=n_cams),
                   np.zeros(n_cams)], -1)
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [f, w / 2, h / 2]

    obs_v, obs_t, obs_xy = [], [], []
    for v in range(n_cams):
        vis = np.abs(X[:, 0] - cx[v]) < window
        ids = np.nonzero(vis)[0]
        uv, depth = cameras.project(
            jnp.asarray(Rs[v]), jnp.asarray(Cs[v]), jnp.int32(PINHOLE),
            jnp.asarray(intr[0]), jnp.asarray(X[ids]))
        uv = np.asarray(uv) + rng.normal(size=(len(ids), 2)) * noise_px
        inside = ((uv[:, 0] > 0) & (uv[:, 0] < w)
                  & (uv[:, 1] > 0) & (uv[:, 1] < h)
                  & (np.asarray(depth) > 0))
        obs_v.append(np.full(inside.sum(), v, np.int32))
        obs_t.append(ids[inside].astype(np.int32))
        obs_xy.append(uv[inside])
    obs_v = np.concatenate(obs_v)
    obs_t = np.concatenate(obs_t)
    obs_xy = np.concatenate(obs_xy).astype(np.float32)
    # keep only tracks seen >=2 times; renumber densely
    cnt = np.bincount(obs_t, minlength=n_pts)
    keep = cnt[obs_t] >= 2
    obs_v, obs_t, obs_xy = obs_v[keep], obs_t[keep], obs_xy[keep]
    uniq, obs_t = np.unique(obs_t, return_inverse=True)
    order = np.argsort(obs_t, kind="stable")
    inputs = incremental.SfMInputs(
        xy=jnp.asarray(obs_xy[order]),
        track_id=jnp.asarray(obs_t[order].astype(np.int32)),
        view_id=jnp.asarray(obs_v[order]),
        feature_id=jnp.asarray(np.zeros(len(order), np.int32)),
        num_tracks=len(uniq),
        intr_id=jnp.zeros((n_cams,), jnp.int32),
        intr=jnp.asarray(intr),
        models=jnp.asarray([PINHOLE], jnp.int32),
        image_sizes=np.tile([[w, h]], (n_cams, 1)))
    table = tracks.TrackTable(np.asarray(obs_t[order].astype(np.int32)),
                              np.asarray(obs_v[order]),
                              np.zeros(len(order), np.int32), len(uniq))
    return inputs, table, Cs


@pytest.mark.slow
def test_incremental_city_scale_stress(rng):
    # VERDICT r1 item 8: hundreds of views with local visibility must run
    # in minutes with flat memory — touched-tracks retriangulation + sparse
    # covisibility keep every per-view step O(local), not O(scene).
    import time
    inputs, table, Cs = corridor_scene(rng)
    cfg = incremental.IncrementalConfig(
        ba_every=50, ba_iterations=2, final_ba_iterations=3,
        resection_iters=256, ransac_iters=512)
    t0 = time.time()
    res = incremental.run_incremental(inputs, cfg=cfg)
    elapsed = time.time() - t0
    n_posed = int(res.pose_mask.sum())
    assert n_posed >= 0.9 * 150, n_posed
    assert res.stats["rms_px"] < 2.0, res.stats
    pm = res.pose_mask
    ate = metrics.ate_rmse(np.asarray(res.C)[pm], Cs[pm])
    assert ate < 0.6, ate            # corridor span 60
    assert elapsed < 1200, elapsed
