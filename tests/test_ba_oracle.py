"""Independent bundle-adjustment oracle (VERDICT r3 item 7).

``ba/lm.py`` is checked against an INDEPENDENT solver: scipy
``least_squares`` (trf, float64, finite-difference Jacobian with an exact
sparsity pattern) minimizing a residual model coded here from scratch in
NumPy — separate Rodrigues formula, separate projection — so no code or
math is shared with the framework's LM/Schur/CG path.  This plays the role
Ceres plays for the reference (OpenMVG BA inside
``/root/reference/src/threads/R3DTriangulationThread.cpp:429-432``): an
external, trusted optimizer reaching the same minimum on the same problem.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from regard3d_tpu.ba import lm
from tests.test_ba import synth_ba_problem

scipy_opt = pytest.importorskip("scipy.optimize")
from scipy.sparse import lil_matrix


def _rodrigues(w):
    """Rotation vector -> matrix, classic Rodrigues (independent of
    core.cameras.exp_so3)."""
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + _hat(w)
    k = w / th
    K = _hat(k)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _pack(rvecs, Cs, X):
    return np.concatenate([rvecs[1:].ravel(), Cs[1:].ravel(), X.ravel()])


def _unpack(p, n_cams, n_pts, r0, C0):
    nc = n_cams - 1
    rv = np.concatenate([r0[None], p[:3 * nc].reshape(nc, 3)])
    Cs = np.concatenate([C0[None], p[3 * nc:6 * nc].reshape(nc, 3)])
    X = p[6 * nc:].reshape(n_pts, 3)
    return rv, Cs, X


def _make_residual_fn(obs_v, obs_p, obs_xy, f, cx, cy, n_cams, n_pts,
                      r0, C0):
    def fn(p):
        rv, Cs, X = _unpack(p, n_cams, n_pts, r0, C0)
        Rms = np.stack([_rodrigues(r) for r in rv])
        Xc = np.einsum("oij,oj->oi", Rms[obs_v], X[obs_p] - Cs[obs_v])
        u = f * Xc[:, 0] / Xc[:, 2] + cx
        v = f * Xc[:, 1] / Xc[:, 2] + cy
        return np.concatenate([u - obs_xy[:, 0], v - obs_xy[:, 1]])
    return fn


def _sparsity(obs_v, obs_p, n_cams, n_pts):
    O = len(obs_v)
    nc = n_cams - 1
    S = lil_matrix((2 * O, 6 * nc + 3 * n_pts), dtype=np.int8)
    for o in range(O):
        vcam = obs_v[o]
        for r in (o, O + o):
            if vcam >= 1:
                S[r, 3 * (vcam - 1):3 * vcam] = 1
                S[r, 3 * nc + 3 * (vcam - 1):3 * nc + 3 * vcam] = 1
            S[r, 6 * nc + 3 * obs_p[o]:6 * nc + 3 * obs_p[o] + 3] = 1
    return S


@pytest.mark.medium
def test_lm_reaches_scipy_minimum(rng):
    """Same noisy problem, two unrelated solvers, same minimum cost."""
    state, gt, obs = synth_ba_problem(rng, n_cams=8, n_pts=250,
                                      noise_px=0.5)
    fixed = jnp.zeros((8,), bool).at[0].set(True)

    obs_v = np.asarray(obs.view_id)
    obs_p = np.asarray(obs.point_id)
    obs_xy = np.asarray(obs.xy, np.float64)
    intr = np.asarray(state.intr[0], np.float64)
    f, cx, cy = intr[0], intr[1], intr[2]

    # rotation vectors of the perturbed init, via scipy (independent log)
    from scipy.spatial.transform import Rotation
    Rm = np.asarray(state.R, np.float64)
    rvecs = Rotation.from_matrix(Rm).as_rotvec()
    Cs = np.asarray(state.C, np.float64)
    X = np.asarray(state.X, np.float64)

    res_fn = _make_residual_fn(obs_v, obs_p, obs_xy, f, cx, cy, 8, 250,
                               rvecs[0], Cs[0])
    S = _sparsity(obs_v, obs_p, 8, 250)
    p0 = _pack(rvecs, Cs, X)
    sol = scipy_opt.least_squares(res_fn, p0, jac_sparsity=S, method="trf",
                                  xtol=1e-12, ftol=1e-12, max_nfev=200)
    scipy_cost = float(np.sum(sol.fun ** 2))

    opts = lm.BAOptions(max_iterations=40)
    out, stats = lm.bundle_adjust(state, obs, opts, fixed_pose_mask=fixed)
    lm_cost = float(stats.final_cost)

    # identical minimum (within f32-vs-f64 slack) — the solvers share no code
    assert lm_cost == pytest.approx(scipy_cost, rel=0.02), \
        (lm_cost, scipy_cost)
    # and the LM trajectory actually descends to it, Ceres-style, in the
    # iteration budget (not an asymptotic crawl)
    assert stats.iterations <= 40
    assert lm_cost < float(stats.initial_cost) * 1e-2


@pytest.mark.medium
def test_lm_cost_trajectory_monotone(rng):
    """Accepted LM steps must decrease cost monotonically (trust-region
    contract) and converge geometrically on a well-posed problem."""
    state, gt, obs = synth_ba_problem(rng, n_cams=6, n_pts=150,
                                      noise_px=0.3)
    fixed = jnp.zeros((6,), bool).at[0].set(True)
    costs = []
    cur = state
    opts = lm.BAOptions(max_iterations=1)
    prev = None
    for _ in range(12):
        cur, stats = lm.bundle_adjust(cur, obs, opts, fixed_pose_mask=fixed)
        c = float(stats.final_cost)
        if prev is not None:
            assert c <= prev * (1 + 1e-6)
        prev = c
        costs.append(c)
    # converged to the measurement-noise floor: E[cost] ~= sigma^2 * dof
    # where dof = 2*O - free parameters (gauge excluded)
    O = obs.xy.shape[0]
    n_params = 5 * 6 + 150 * 3
    floor = 0.3 ** 2 * (2 * O - n_params)
    assert costs[-1] < 1.5 * floor, (costs[-1], floor)
    # and the first step does almost all the work (healthy LM, not a crawl)
    assert costs[1] < costs[0] * 0.5, costs
