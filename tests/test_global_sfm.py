import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regard3d_tpu.core import cameras, metrics
from regard3d_tpu.sfm import global_sfm, incremental, tracks

from tests.test_incremental import build_inputs, synth_scene


def make_motions_from_gt(rng, V=10, noise_rad=0.0):
    """Synthetic relative rotations from a GT set, ring + chords topology."""
    Rg = [np.asarray(cameras.exp_so3(jnp.asarray(rng.normal(size=3) * 0.5)))
          for _ in range(V)]
    Rg[0] = np.eye(3)
    Cg = rng.normal(size=(V, 3)) * 2
    Cg -= Cg.mean(0)
    motions = []
    pairs = [(i, (i + 1) % V) for i in range(V)] + \
            [(i, (i + 3) % V) for i in range(V)]
    for i, j in pairs:
        if i == j:
            continue
        i, j = min(i, j), max(i, j)
        R_ij = Rg[j] @ Rg[i].T
        if noise_rad > 0:
            R_ij = np.asarray(cameras.exp_so3(
                jnp.asarray(rng.normal(size=3) * noise_rad))) @ R_ij
        d_w = Cg[j] - Cg[i]
        d_w = d_w / np.linalg.norm(d_w)
        d_i = Rg[i] @ d_w
        motions.append(global_sfm.RelativeMotion(
            i, j, R_ij, d_i, 100, np.zeros(0, np.int64), np.zeros(0, np.int64)))
    return motions, np.stack(Rg), Cg


def test_rotation_averaging_exact(rng):
    motions, Rg, Cg = make_motions_from_gt(rng)
    R = global_sfm.average_rotations(motions, 10, "l2")
    # gauge: R[0] = I; compare directly
    err = metrics.rotation_error_deg(R, Rg)
    assert err.max() < 0.1, err


def test_rotation_averaging_l1_resists_outlier(rng):
    motions, Rg, Cg = make_motions_from_gt(rng, noise_rad=0.01)
    # corrupt two measurements grossly
    bad = np.asarray(cameras.exp_so3(jnp.asarray([1.5, -0.5, 1.0])))
    motions[3] = motions[3]._replace(R_ij=bad @ motions[3].R_ij)
    motions[11] = motions[11]._replace(R_ij=bad.T @ motions[11].R_ij)
    R_l1 = global_sfm.average_rotations(motions, 10, "l1")
    err_l1 = metrics.rotation_error_deg(R_l1, Rg)
    R_l2 = global_sfm.average_rotations(motions, 10, "l2")
    err_l2 = metrics.rotation_error_deg(R_l2, Rg)
    assert err_l1.max() < err_l2.max()
    assert err_l1.max() < 3.0, err_l1


def test_translation_averaging_exact(rng):
    motions, Rg, Cg = make_motions_from_gt(rng)
    C = global_sfm.average_translations(motions, Rg, 10, "l2_chordal")
    # compare up to scale (centroid already zero)
    ate = metrics.ate_rmse(C, Cg)
    assert ate < 0.02 * np.linalg.norm(Cg, axis=1).mean(), ate


@pytest.mark.parametrize("loss", ["l1", "softl1"])
def test_translation_averaging_robust(rng, loss):
    motions, Rg, Cg = make_motions_from_gt(rng)
    motions[2] = motions[2]._replace(dir_i=np.array([0.0, 0.0, 1.0]))
    C = global_sfm.average_translations(motions, Rg, 10, loss)
    ate = metrics.ate_rmse(C, Cg)
    assert ate < 0.05 * np.linalg.norm(Cg, axis=1).mean(), ate


@pytest.mark.medium
def test_global_pipeline_full(rng):
    scene = synth_scene(rng, n_cams=8, visibility=0.9, noise_px=0.15)
    inputs, table = build_inputs(scene)
    result = global_sfm.run_global(
        inputs, global_sfm.GlobalConfig(ransac_iters=512,
                                        min_pair_inliers=15))
    assert result.stats["num_cameras"] == 8, result.stats
    assert result.stats["rms_px"] < 1.0, result.stats
    ate = metrics.ate_rmse(np.asarray(result.C[result.pose_mask]),
                           scene["Cs"][result.pose_mask])
    # scene scale ~10 (at 0.4px noise this weak-geometry arc has a
    # legitimate low-frequency bending valley; 0.15px pins it)
    assert ate < 0.05, ate


def collinear_scene(rng, n_cams=7, n_pts=400, f=900.0, w=1280, h=960):
    """Cameras along a line with UNEVEN spacing, all looking forward —
    the classic degenerate case for direction-only translation averaging
    (every pairwise direction is the same; per-edge spacing is otherwise
    unconstrained). Shared-track scale reconciliation must recover it."""
    from regard3d_tpu.core.types import PINHOLE
    X = rng.normal(size=(n_pts, 3)) * [6, 3, 1.5] + [0, 0, 10]
    gaps = rng.uniform(0.5, 3.0, n_cams - 1)
    xs = np.concatenate([[0.0], np.cumsum(gaps)])
    Cs = np.stack([xs, np.zeros(n_cams), np.zeros(n_cams)], -1)
    Rs = [np.eye(3) for _ in range(n_cams)]
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [f, w / 2, h / 2]

    feats, vis_table = [], {}
    for v in range(n_cams):
        uv, depth = cameras.project(
            jnp.asarray(Rs[v]), jnp.asarray(Cs[v]), jnp.int32(PINHOLE),
            jnp.asarray(intr[0]), jnp.asarray(X))
        uv = np.asarray(uv) + rng.normal(size=(n_pts, 2)) * 0.3
        inside = ((uv[:, 0] > 0) & (uv[:, 0] < w)
                  & (uv[:, 1] > 0) & (uv[:, 1] < h)
                  & (np.asarray(depth) > 0))
        ids = np.where(inside)[0]
        feats.append((ids, uv[ids]))
    matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            pi = dict((pid, k) for k, pid in enumerate(feats[i][0]))
            m = [(pi[pid], k) for k, pid in enumerate(feats[j][0])
                 if pid in pi]
            if len(m) >= 30:
                matches[(i, j)] = np.asarray(m, np.int64)
    return dict(feats=feats, matches=matches, intr=intr, model=PINHOLE,
                w=w, h=h, Cs=Cs, Rs=np.stack(Rs))


@pytest.mark.medium
def test_translation_averaging_collinear_centers(rng):
    """Uneven spacing along a line is unrecoverable from directions alone;
    the shared-track scale reconciliation must recover it (VERDICT weak#7:
    OpenMVG's SoftL1 survives this via its relative-scale stage)."""
    scene = collinear_scene(rng)
    inputs, table = build_inputs(scene)
    V = len(scene["feats"])
    key = jax.random.PRNGKey(0)
    cfg = global_sfm.GlobalConfig(ransac_iters=256)
    motions = global_sfm.compute_relative_motions(inputs, table, cfg, key, V)
    assert len(motions) >= V - 1
    Rg = global_sfm.average_rotations(motions, V, "l2")
    C = global_sfm.average_translations(motions, Rg, V, "softl1",
                                        inputs=inputs)
    # compare spacing pattern after scale/sign alignment along the line
    gt = scene["Cs"] - scene["Cs"].mean(0)
    gt = gt / np.linalg.norm(gt, axis=-1).mean()
    # align sign
    if np.dot(C[-1] - C[0], gt[-1] - gt[0]) < 0:
        C = -C
    err = np.linalg.norm(C - gt, axis=-1)
    assert err.max() < 0.08, (err, C[:, 0], gt[:, 0])

    # the spectral fallback CANNOT recover the uneven spacing pattern
    C_sp = global_sfm._average_translations_spectral(motions, Rg, V)
    if np.dot(C_sp[-1] - C_sp[0], gt[-1] - gt[0]) < 0:
        C_sp = -C_sp
    err_sp = np.linalg.norm(C_sp - gt, axis=-1)
    assert err.max() < err_sp.max()
