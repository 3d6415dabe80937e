"""Minimal solvers: Nistér 5-point essential + Grunert P3P (VERDICT r2 #3).

The reference's OpenMVG engines run these inside ACRANSAC (SURVEY §2.3);
we verify (a) exact recovery on clean data, (b) higher robust-estimation
recall than the 8-point/DLT alternatives at large outlier ratios, and
(c) that the 5-point filter handles planar scenes (the 8-point
degeneracy that motivated the old planar-demotion heuristic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regard3d_tpu.core import cameras
from regard3d_tpu.kernels import geometry, ransac


def _cross(t):
    return np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                     [-t[1], t[0], 0]])


def _rand_rot(rng, scale=0.2):
    return np.asarray(cameras.exp_so3(jnp.asarray(rng.normal(size=3)
                                                  * scale)))


def synth_pair(rng, n, planar=False, noise=0.0, outlier_frac=0.0):
    R = _rand_rot(rng)
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    if planar:
        Xxy = rng.uniform(-4, 4, size=(n, 2))
        X = np.concatenate([Xxy, np.full((n, 1), 7.0)], 1)
    else:
        X = rng.normal(size=(n, 3)) * [3, 2.5, 1.5] + [0, 0, 7]
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    if noise:
        x1 = x1 + rng.normal(size=x1.shape) * noise
        x2 = x2 + rng.normal(size=x2.shape) * noise
    inl = np.ones(n, bool)
    n_out = int(outlier_frac * n)
    if n_out:
        bad = rng.choice(n, n_out, replace=False)
        x2[bad] = rng.uniform(-0.8, 0.8, size=(n_out, 2))
        inl[bad] = False
    E = _cross(t) @ R
    E /= np.linalg.norm(E)
    return (x1.astype(np.float32), x2.astype(np.float32), E, R, t, inl)


def test_fit_essential_5pt_exact(rng):
    S = 32
    got = 0
    x1s, x2s, Es = [], [], []
    for _ in range(S):
        x1, x2, E, _, _, _ = synth_pair(rng, 5)
        x1s.append(x1)
        x2s.append(x2)
        Es.append(E)
    E5, ok = geometry.fit_essential_5pt(jnp.asarray(np.stack(x1s)),
                                        jnp.asarray(np.stack(x2s)))
    E5 = np.asarray(E5)
    ok = np.asarray(ok)
    for s in range(S):
        best = min((min(np.abs(E5[s, k] - Es[s]).max(),
                        np.abs(E5[s, k] + Es[s]).max())
                    for k in range(10) if ok[s, k]), default=2.0)
        if best < 1e-2:
            got += 1
    # f32 solves ~60% of minimal problems to high accuracy (f64 solves
    # ~100%: the 10x20 reduction + degree-10 roots lose ~4 digits); RANSAC
    # absorbs the imprecise rest — they score poorly and the winner is
    # refit. Gate the f32 floor:
    assert got >= 0.5 * S, got


def test_p3p_grunert_exact(rng):
    S = 32
    Xs, xs, Rs, Cs = [], [], [], []
    for _ in range(S):
        R = _rand_rot(rng, 0.5)
        C = rng.normal(size=3).astype(np.float32)
        X = (rng.normal(size=(3, 3)) * 2 + [0, 0, 7]).astype(np.float32)
        Xw = X + C          # keep depth positive-ish in camera frame
        xc = (Xw - C) @ R.T
        if (xc[:, 2] < 0.5).any():
            continue
        Xs.append(Xw)
        xs.append(xc[:, :2] / xc[:, 2:])
        Rs.append(R)
        Cs.append(C)
    Rp, Cp, ok = geometry.p3p_grunert(
        jnp.asarray(np.stack(Xs), jnp.float32),
        jnp.asarray(np.stack(xs), jnp.float32))
    Rp = np.asarray(Rp)
    Cp = np.asarray(Cp)
    ok = np.asarray(ok)
    got = 0
    for s in range(len(Xs)):
        best = min((np.abs(Rp[s, k] - Rs[s]).max()
                    + np.abs(Cp[s, k] - Cs[s]).max()
                    for k in range(4) if ok[s, k]), default=10.0)
        if best < 0.05:
            got += 1
    assert got >= 0.9 * len(Xs), (got, len(Xs))


@pytest.mark.medium
@pytest.mark.parametrize("outlier_frac", [0.6])
def test_acransac_e_5pt_beats_8pt_at_high_outliers(rng, outlier_frac):
    """The minimal 5-point sample keeps the all-inlier draw probability
    ~(1-e)^5 vs (1-e)^8 — at 60% outliers that is 26x more good samples
    per iteration budget."""
    wins5, wins8 = 0, 0
    for trial in range(6):
        x1, x2, E, R, t, inl = synth_pair(rng, 256, noise=5e-4,
                                          outlier_frac=outlier_frac)
        key = jax.random.PRNGKey(trial)
        mask = jnp.ones((256,), bool)
        la = jnp.float32(np.log10(2.0))
        me = jnp.float32((4.0 / 1000.0) ** 2)
        r5 = ransac._e_one(key, jnp.asarray(x1), jnp.asarray(x2), mask,
                           la, me, iters=512)
        r8 = ransac._e_one_8pt(key, jnp.asarray(x1), jnp.asarray(x2),
                               mask, la, me, iters=512)
        rec5 = (np.asarray(r5.inliers) & inl).sum() / inl.sum()
        rec8 = (np.asarray(r8.inliers) & inl).sum() / inl.sum()
        wins5 += rec5 >= 0.8
        wins8 += rec8 >= 0.8
    assert wins5 >= 4, (wins5, wins8)
    assert wins5 >= wins8, (wins5, wins8)


@pytest.mark.medium
def test_acransac_e_5pt_planar_scene(rng):
    """Planar scenes degenerate the 8-point E fit (rank deficiency) but
    not the 5-point solver — the old planar-demotion heuristic is not
    needed for pose recovery here."""
    ok_pose = 0
    for trial in range(4):
        x1, x2, E, R, t, _ = synth_pair(rng, 256, planar=True, noise=3e-4)
        key = jax.random.PRNGKey(10 + trial)
        mask = jnp.ones((256,), bool)
        res = ransac._e_one(key, jnp.asarray(x1), jnp.asarray(x2), mask,
                            jnp.float32(np.log10(2.0)),
                            jnp.float32((4.0 / 1000.0) ** 2), iters=256)
        if not bool(res.valid):
            continue
        Rr, tr, ng = geometry.decompose_essential(
            np.asarray(res.model)[None],
            jnp.asarray(x1)[None], jnp.asarray(x2)[None])
        err = min(np.abs(np.asarray(Rr[0]) - R).max(), 2.0)
        ok_pose += err < 0.05
    assert ok_pose >= 3, ok_pose
