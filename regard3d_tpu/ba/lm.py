"""Bundle adjustment — Levenberg–Marquardt with implicit Schur complement.

The TPU-native replacement for the Ceres solver OpenMVG runs inside its SfM
engines (``src/threads/R3DTriangulationThread.cpp`` — iterated BA with
intrinsic-refinement switches ``:429-432`` and GPS pose priors ``:433``;
P6 in SURVEY.md §2.3).

Design (how this maps to the hardware):

* The scene is flat SoA arrays (cameras (V,6 dof), intrinsics (K,<=9),
  points (L,3), observations (O,)).  Every per-observation quantity —
  residuals, Jacobian blocks A (2x6), B (2x3), Ji (2x9) — is one batched
  ``vmap(jacfwd)`` evaluation: pure fused VPU work, no per-residual code.
* Normal equations are never materialized beyond block diagonals:
  U (V,6,6), V_l (L,3,3) and gradients come from ``segment_sum`` over the
  observation table; the off-diagonal coupling W only ever appears inside
  matvecs.
* The reduced camera system S = U - W V^-1 W^T is solved by (Jacobi-
  preconditioned) conjugate gradients with **implicit** S-products:
  S x = U x - W (V^-1 (W^T x)) — three segment ops per CG step.  This is
  the part that scales: shard the observation table over a mesh axis and
  every segment_sum gains a ``psum`` (see ``ba/sharded.py``).
* LM outer loop runs on host (few iterations), each trial step jitted.

Gauge: pass ``fixed_pose_mask`` to pin chosen cameras (incremental SfM pins
the initial pair's first camera; plus the scale via the prior term if
desired). A GPS/center prior (weight * ||C - C_prior||^2) matches the
reference's motion-prior option.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from regard3d_tpu.core import cameras as cam


def _psum(x, axis_name):
    """psum when running SPMD under shard_map (observations sharded over
    `axis_name`), identity in single-device mode."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


@dataclasses.dataclass(frozen=True)
class BAOptions:
    max_iterations: int = 30
    cg_iterations: int = 40
    cg_tol: float = 1e-6              # relative preconditioned-residual stop
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-10
    max_lambda: float = 1e8
    refine_intrinsics: bool = False       # ADJUST_ALL vs NONE parity
    huber_delta_px: float = 0.0           # 0 = plain squared loss
    center_prior_weight: float = 0.0      # GPS prior strength
    ftol: float = 1e-8


class BAState(NamedTuple):
    R: jnp.ndarray            # (V, 3, 3)
    C: jnp.ndarray            # (V, 3)
    intr: jnp.ndarray         # (K, 9) [f, cx, cy, d0..d5]
    X: jnp.ndarray            # (L, 3)


class BAObservations(NamedTuple):
    view_id: jnp.ndarray      # (O,) int32
    intr_id: jnp.ndarray      # (O,) int32
    point_id: jnp.ndarray     # (O,) int32
    model: jnp.ndarray        # (O,) int32 camera model code
    xy: jnp.ndarray           # (O, 2)
    weight: jnp.ndarray       # (O,) float — 0 masks the row


NUM_INTR_DOF = 9


def _residual_one(dw, dC, dX, dintr, R0, C0, intr0, model, X0, uv):
    """Residual of one observation at local increments (all zeros at the
    linearization point)."""
    R = cam.exp_so3(dw) @ R0
    C = C0 + dC
    X = X0 + dX
    params = intr0 + dintr
    proj, _ = cam.project(R, C, model, params, X)
    return proj - uv


_jac_res = jax.vmap(
    jax.jacfwd(_residual_one, argnums=(0, 1, 2, 3)),
    in_axes=(None, None, None, None, 0, 0, 0, 0, 0, 0))
_res_only = jax.vmap(_residual_one,
                     in_axes=(None, None, None, None, 0, 0, 0, 0, 0, 0))


def _gather(state: BAState, obs: BAObservations):
    R0 = state.R[obs.view_id]
    C0 = state.C[obs.view_id]
    intr0 = state.intr[obs.intr_id]
    X0 = state.X[obs.point_id]
    return R0, C0, intr0, X0


def compute_residuals(state: BAState, obs: BAObservations):
    """(O, 2) residuals in pixels at the current state."""
    R0, C0, intr0, X0 = _gather(state, obs)
    z3 = jnp.zeros(3, state.X.dtype)
    z9 = jnp.zeros(NUM_INTR_DOF, state.X.dtype)
    return _res_only(z3, z3, z3, z9, R0, C0, intr0, obs.model, X0, obs.xy)


def compute_cost(state: BAState, obs: BAObservations,
                 opts: BAOptions) -> jnp.ndarray:
    r = compute_residuals(state, obs)
    r2 = jnp.sum(r * r, -1)
    # rows behind the camera / at zero depth project to non-finite values;
    # treat them as a huge-but-finite cost so LM rejects the step instead
    # of the whole reduction becoming NaN (and NaN*0 poisoning masked rows)
    r2 = jnp.where(jnp.isfinite(r2), r2, 1e12)
    if opts.huber_delta_px > 0:
        d = opts.huber_delta_px
        rho = jnp.where(r2 <= d * d, r2, 2.0 * d * jnp.sqrt(r2) - d * d)
    else:
        rho = r2
    return jnp.sum(jnp.where(obs.weight > 0, rho * obs.weight, 0.0))


def _irls_weights(r2, opts: BAOptions):
    if opts.huber_delta_px <= 0:
        return jnp.ones_like(r2)
    d = opts.huber_delta_px
    rnorm = jnp.sqrt(jnp.maximum(r2, 1e-24))
    return jnp.where(r2 <= d * d, 1.0, d / rnorm)


def _build_blocks(state: BAState, obs: BAObservations, opts: BAOptions):
    """Per-observation residuals + Jacobian blocks, IRLS-weighted.

    Returns r (O,2), A (O,2,6) cam block, B (O,2,3) point block,
    Ji (O,2,9) intrinsic block, w (O,)."""
    R0, C0, intr0, X0 = _gather(state, obs)
    z3 = jnp.zeros(3, state.X.dtype)
    z9 = jnp.zeros(NUM_INTR_DOF, state.X.dtype)
    r = _res_only(z3, z3, z3, z9, R0, C0, intr0, obs.model, X0, obs.xy)
    Jw, JC, JX, Jintr = _jac_res(z3, z3, z3, z9, R0, C0, intr0, obs.model,
                                 X0, obs.xy)
    A = jnp.concatenate([Jw, JC], -1)           # (O, 2, 6)
    # masked rows (weight 0) and degenerate live rows (zero/negative depth
    # -> non-finite projection) must contribute exact zeros: a NaN row
    # times weight 0 would otherwise poison every segment reduction
    live = obs.weight > 0
    r = jnp.where(live[:, None] & jnp.isfinite(r), r, 0.0)
    A = jnp.where(live[:, None, None] & jnp.isfinite(A), A, 0.0)
    B = jnp.where(live[:, None, None] & jnp.isfinite(JX), JX, 0.0)
    Ji = jnp.where(live[:, None, None] & jnp.isfinite(Jintr), Jintr, 0.0)
    w = obs.weight * _irls_weights(jnp.sum(r * r, -1), opts)
    return r, A, B, Ji, w


class _Normal(NamedTuple):
    """Cached block-diagonal pieces for one linearization."""
    A: jnp.ndarray        # (O, 2, 6)
    B: jnp.ndarray        # (O, 2, 3)
    Ji: jnp.ndarray       # (O, 2, 9)
    w: jnp.ndarray        # (O,)
    U: jnp.ndarray        # (V, 6, 6)
    Vl: jnp.ndarray       # (L, 3, 3)
    Ui: jnp.ndarray       # (K, 9, 9)
    gc: jnp.ndarray       # (V, 6)
    gp: jnp.ndarray       # (L, 3)
    gi: jnp.ndarray       # (K, 9)


_FOLLOW = "__follow_axis__"


def _normal_blocks(state, obs, opts, axis_name=None,
                   layout=None, point_axis_name=_FOLLOW) -> _Normal:
    if point_axis_name is _FOLLOW:
        point_axis_name = axis_name
    r, A, B, Ji, w = _build_blocks(state, obs, opts)
    V = state.R.shape[0]
    L = state.X.shape[0]
    K = state.intr.shape[0]
    wA = A * w[:, None, None]
    wB = B * w[:, None, None]
    wJi = Ji * w[:, None, None]
    if layout is not None:
        red_c = lambda x: _reduce(x, layout.cam_rows, layout.cam_mask)
        red_p = lambda x: _reduce(x, layout.pt_rows, layout.pt_mask)
        red_i = lambda x: _reduce(x, layout.intr_rows, layout.intr_mask)
    else:
        red_c = lambda x: segment_sum(x, obs.view_id, V)
        red_p = lambda x: segment_sum(x, obs.point_id, L)
        red_i = lambda x: segment_sum(x, obs.intr_id, K)
    U = red_c(jnp.einsum("oki,okj->oij", wA, A))
    Ui = red_i(jnp.einsum("oki,okj->oij", wJi, Ji))
    gc = red_c(jnp.einsum("oki,ok->oi", wA, r))
    gi = red_i(jnp.einsum("oki,ok->oi", wJi, r))
    if axis_name is not None:
        # one fused collective for the whole (small) camera system
        U, Ui, gc, gi = jax.lax.psum((U, Ui, gc, gi), axis_name)
    Vl = _psum(red_p(jnp.einsum("oki,okj->oij", wB, B)), point_axis_name)
    gp = _psum(red_p(jnp.einsum("oki,ok->oi", wB, r)), point_axis_name)
    return _Normal(A, B, Ji, w, U, Vl, Ui, gc, gp, gi)


def _damped_inv(M, lam, eps=1e-12):
    """(M + lam * diag(M) + eps I)^-1, batched over leading dims."""
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    Md = M + (lam * d + eps)[..., None] * jnp.eye(M.shape[-1], dtype=M.dtype)
    return jnp.linalg.inv(Md)


def _solve_schur(nb: _Normal, obs: BAObservations, lam, state,
                 opts: BAOptions, fixed_pose_mask, intr_dof_mask,
                 axis_name=None, layout=None, point_axis_name=_FOLLOW):
    """One damped Schur/CG solve. Returns (dc (V,6), dp (L,3), di (K,9)).

    ``point_axis_name`` controls whether per-point reductions are psum'd:
    in the observation-sharded path it equals ``axis_name`` (a point's rows
    live on several devices); in the point-block-sharded path it is None
    (all rows of a point are co-located, so W^T x / V-blocks are local and
    the only collectives are the small (V,6)+(K,9) camera-system psums)."""
    if point_axis_name is _FOLLOW:
        point_axis_name = axis_name
    V = nb.U.shape[0]
    L = nb.Vl.shape[0]
    K = nb.Ui.shape[0]
    dtype = nb.U.dtype

    free_c = (~fixed_pose_mask).astype(dtype)[:, None]              # (V, 1)
    intr_free = intr_dof_mask.astype(dtype)                         # (K, 9)

    Vinv = _damped_inv(nb.Vl, lam)                                  # (L,3,3)

    eyeU = jnp.eye(6, dtype=dtype)
    d6 = jnp.diagonal(nb.U, axis1=-2, axis2=-1)
    Ud = nb.U + (lam * d6 + 1e-12)[..., None] * eyeU
    eyeI = jnp.eye(9, dtype=dtype)
    d9 = jnp.diagonal(nb.Ui, axis1=-2, axis2=-1)
    Uid = nb.Ui + (lam * d9 + 1.0)[..., None] * eyeI   # +1: unused dof pinned

    wA = nb.A * nb.w[:, None, None]
    wB = nb.B * nb.w[:, None, None]
    wJi = nb.Ji * nb.w[:, None, None]

    if layout is not None:
        red_c = lambda x: _reduce(x, layout.cam_rows, layout.cam_mask)
        red_p = lambda x: _reduce(x, layout.pt_rows, layout.pt_mask)
        red_i = lambda x: _reduce(x, layout.intr_rows, layout.intr_mask)
    else:
        red_c = lambda x: segment_sum(x, obs.view_id, V)
        red_p = lambda x: segment_sum(x, obs.point_id, L)
        red_i = lambda x: segment_sum(x, obs.intr_id, K)

    def WT_x(xc, xi):
        """W^T [xc; xi] -> per-point 3-vectors."""
        ax = jnp.einsum("oki,oi->ok", nb.A, xc[obs.view_id])
        ix = jnp.einsum("oki,oi->ok", nb.Ji, xi[obs.intr_id])
        return _psum(red_p(jnp.einsum("oki,ok->oi", wB, ax + ix)),
                     point_axis_name)

    def W_y(yp):
        """W y -> (camera part, intrinsic part)."""
        by = jnp.einsum("oki,oi->ok", nb.B, yp[obs.point_id])
        c = _psum(red_c(jnp.einsum("oki,ok->oi", wA, by)), axis_name)
        i = _psum(red_i(jnp.einsum("oki,ok->oi", wJi, by)), axis_name)
        return c, i

    def S_mv(x):
        """Implicit reduced-system matvec over stacked [cams; intrinsics].

        The cross-coupling (Ji^T w A, A^T w Ji) and the Schur products
        W V^-1 W^T are fused into single per-observation passes: camera
        rows reduce A^T w (ix - by), intrinsic rows Ji^T w (ax - by), and
        the two small results ship in ONE psum — per-CG-step communication
        is (V,6)+(K,9) regardless of the landmark count."""
        xc = x["c"] * free_c
        xi = x["i"] * intr_free
        ax = jnp.einsum("oki,oi->ok", nb.A, xc[obs.view_id])
        ix = jnp.einsum("oki,oi->ok", nb.Ji, xi[obs.intr_id])
        t = _psum(red_p(jnp.einsum("oki,ok->oi", wB, ax + ix)),
                  point_axis_name)
        y = jnp.einsum("lij,lj->li", Vinv, t)
        by = jnp.einsum("oki,oi->ok", nb.B, y[obs.point_id])
        dc_part = red_c(jnp.einsum("oki,ok->oi", wA, ix - by))
        di_part = red_i(jnp.einsum("oki,ok->oi", wJi, ax - by))
        if axis_name is not None:
            dc_part, di_part = jax.lax.psum((dc_part, di_part), axis_name)
        uc = jnp.einsum("vij,vj->vi", Ud, xc) + dc_part
        ui = jnp.einsum("kij,kj->ki", Uid, xi) + di_part
        return {"c": uc * free_c, "i": ui * intr_free}

    # rhs = -g + W V^-1 gp  (for [c; i])
    y0 = jnp.einsum("lij,lj->li", Vinv, nb.gp)
    wc0, wi0 = W_y(y0)
    rhs = {"c": (-nb.gc + wc0) * free_c, "i": (-nb.gi + wi0) * intr_free}

    # Jacobi preconditioner from damped block diagonals
    pc = 1.0 / jnp.maximum(jnp.diagonal(Ud, axis1=-2, axis2=-1), 1e-12)
    pi = 1.0 / jnp.maximum(jnp.diagonal(Uid, axis1=-2, axis2=-1), 1e-12)

    def precond(x):
        return {"c": x["c"] * pc * free_c, "i": x["i"] * pi * intr_free}

    def dot(a, b):
        return jnp.sum(a["c"] * b["c"]) + jnp.sum(a["i"] * b["i"])

    # preconditioned CG with a relative residual stop (Ceres-style
    # eta-termination: quit once the preconditioned residual norm has
    # dropped by cg_tol, instead of always burning cg_iterations steps)
    x = {"c": jnp.zeros_like(rhs["c"]), "i": jnp.zeros_like(rhs["i"])}
    rvec = rhs
    z = precond(rvec)
    p = z
    rz = dot(rvec, z)
    rz0 = rz

    def cg_cond(carry):
        it, x, rvec, p, rz = carry
        return (it < opts.cg_iterations) & (rz > opts.cg_tol ** 2 * rz0)

    def cg_body(carry):
        it, x, rvec, p, rz = carry
        Sp = S_mv(p)
        alpha = rz / jnp.maximum(dot(p, Sp), 1e-30)
        x = jax.tree_util.tree_map(lambda a, b: a + alpha * b, x, p)
        rvec = jax.tree_util.tree_map(lambda a, b: a - alpha * b, rvec, Sp)
        z = precond(rvec)
        rz_new = dot(rvec, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = jax.tree_util.tree_map(lambda a, b: a + beta * b, z, p)
        return it + 1, x, rvec, p, rz_new

    _, x, rvec, p, rz = jax.lax.while_loop(
        cg_cond, cg_body, (jnp.int32(0), x, rvec, p, rz))
    dc = x["c"]
    di = x["i"]

    # back-substitute points: dp = V^-1 (-gp - W^T dc)
    dp = jnp.einsum("lij,lj->li", Vinv, -nb.gp - WT_x(dc, di))
    return dc, dp, di


def _apply_step(state: BAState, dc, dp, di) -> BAState:
    R = cam.exp_so3(dc[:, :3]) @ state.R
    C = state.C + dc[:, 3:]
    X = state.X + dp
    intr = state.intr + di
    return BAState(R, C, intr, X)


def _intr_dof_mask(models, refine: bool, dtype):
    """(K, 9) mask of refined intrinsic dofs: focal, pp, and the model's
    distortion params (DISTO_NPARAMS)."""
    from regard3d_tpu.core.types import DISTO_NPARAMS
    K = models.shape[0]
    if not refine:
        return jnp.zeros((K, 9), bool)
    nd = jnp.asarray([0, 1, 3, 5, 4])[jnp.clip(models, 0, 4)]     # per model
    cols = jnp.arange(9)[None, :]
    base = cols < 3                                                # f, cx, cy
    disto = (cols >= 3) & (cols < 3 + nd[:, None])
    return base | disto


def lm_trial(state, lam, obs, opts, fixed_pose_mask, intr_mask,
             center_prior=None, axis_name=None, layout=None,
             point_axis_name=_FOLLOW):
    """One damped LM trial step (linearize + Schur/CG solve + apply).

    Pure function of replicated state and (possibly sharded) observations;
    under ``shard_map`` pass the mesh axis holding the observation shards as
    ``axis_name`` and every reduction gains a psum.  ``layout`` switches the
    reductions to the scatter-free gather path (see BALayout).  Pass
    ``point_axis_name=None`` when landmarks (and their observation rows) are
    block-sharded so per-point reductions stay local (``ba/sharded.py``)."""
    nb = _normal_blocks(state, obs, opts, axis_name, layout, point_axis_name)
    if center_prior is not None and opts.center_prior_weight > 0:
        w = opts.center_prior_weight
        eye_c = jnp.zeros((6, 6), state.X.dtype).at[3:, 3:].set(
            jnp.eye(3, dtype=state.X.dtype))
        nb = nb._replace(
            U=nb.U + w * eye_c[None],
            gc=nb.gc.at[:, 3:].add(w * (state.C - center_prior)))
    dc, dp, di = _solve_schur(nb, obs, lam, state, opts,
                              fixed_pose_mask, intr_mask, axis_name, layout,
                              point_axis_name)
    return _apply_step(state, dc, dp, di)


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: int
    final_lambda: float


def _trace_key_opts(opts: BAOptions) -> BAOptions:
    """Normalize host-loop-only fields so BA calls that differ only in
    outer-loop policy (max_iterations, lambda schedule, refine switch —
    all consumed on host) share one compiled trial program."""
    return dataclasses.replace(
        opts, max_iterations=0, init_lambda=0.0, lambda_up=0.0,
        lambda_down=0.0, min_lambda=0.0, max_lambda=0.0, ftol=0.0,
        refine_intrinsics=False)


def _full_cost(st: BAState, obs: BAObservations, opts: BAOptions,
               center_prior):
    c = compute_cost(st, obs, opts)
    if center_prior is not None and opts.center_prior_weight > 0:
        c = c + opts.center_prior_weight * jnp.sum(
            (st.C - center_prior) ** 2)
    return c


# Module-level jits: traced ONCE per shape-set for the whole process.
# (A per-call ``jax.jit`` closure gets a fresh cache every bundle_adjust
# invocation — at 200+ incremental-SfM BA rounds that is hundreds of
# seconds of pure retrace/recompile.)
@functools.partial(jax.jit, static_argnames=("opts",))
def _cost_jit(state, obs, opts, center_prior):
    return _full_cost(state, obs, opts, center_prior)


@functools.partial(jax.jit, static_argnames=("opts",))
def _trial_jit(state, lam, obs, opts, fixed_pose_mask, intr_mask,
               center_prior, layout):
    new_state = lm_trial(state, lam, obs, opts, fixed_pose_mask,
                         intr_mask, center_prior, layout=layout)
    return new_state, _full_cost(new_state, obs, opts, center_prior)


def bundle_adjust(state: BAState, obs: BAObservations,
                  opts: BAOptions = BAOptions(),
                  fixed_pose_mask: Optional[jnp.ndarray] = None,
                  center_prior: Optional[jnp.ndarray] = None,
                  layout: Optional["BALayout"] = None):
    """Run LM to convergence. Host outer loop, jitted inner steps.

    ``layout``: optional precomputed gather layout (it depends only on the
    observation index tables, so incremental SfM builds it once and reuses
    it across every BA round). Returns (state, BAStats)."""
    V = state.R.shape[0]
    if fixed_pose_mask is None:
        fixed_pose_mask = jnp.zeros((V,), bool)

    # model code per intrinsic group, recovered from the observation table
    K = state.intr.shape[0]
    intr_models = jnp.zeros((K,), jnp.int32).at[obs.intr_id].set(obs.model)
    intr_mask = _intr_dof_mask(intr_models, opts.refine_intrinsics,
                               state.X.dtype)

    if layout is None:
        layout = make_layout(obs, V, state.X.shape[0], K)
    key_opts = _trace_key_opts(opts)

    cost = float(_cost_jit(state, obs, key_opts, center_prior))
    initial = cost
    lam = opts.init_lambda
    it = 0
    for it in range(1, opts.max_iterations + 1):
        new_state, new_cost = _trial_jit(state, lam, obs, key_opts,
                                         fixed_pose_mask, intr_mask,
                                         center_prior, layout)
        new_cost = float(new_cost)
        if jnp.isfinite(new_cost) and new_cost < cost:
            rel = (cost - new_cost) / max(cost, 1e-30)
            state = new_state
            cost = new_cost
            lam = max(lam * opts.lambda_down, opts.min_lambda)
            if rel < opts.ftol:
                break
        else:
            lam = lam * opts.lambda_up
            if lam > opts.max_lambda:
                break
    return state, BAStats(initial, cost, it, lam)


# ---------------------------------------------------------------------------
# Gather-based reduction layout (TPU fast path)
# ---------------------------------------------------------------------------
#
# ``segment_sum`` lowers to scatter-add, which serializes badly on TPU; the
# LM trial above spends most of its time there.  The TPU-native layout
# replaces every scatter with a *gather + dense masked sum*: host-side we
# build padded index tables rows_of_camera (V, Nc) and rows_of_point (L, Np)
# into the observation table, and each reduction becomes
#     arr[rows].reshape(V, Nc, ...) .sum(axis=1)
# — pure gathers and reductions the compiler pipelines well.  Padding uses
# row 0 with weight 0 via the mask.

class BALayout(NamedTuple):
    cam_rows: jnp.ndarray     # (V, Nc) int32 obs indices (0-padded)
    cam_mask: jnp.ndarray     # (V, Nc) float
    pt_rows: jnp.ndarray      # (L, Np) int32
    pt_mask: jnp.ndarray      # (L, Np) float
    intr_rows: jnp.ndarray    # (K, Ni) int32
    intr_mask: jnp.ndarray    # (K, Ni) float


def make_layout(obs: BAObservations, num_cams: int, num_points: int,
                num_intrinsics: int, max_pad_factor: float = 4.0
                ) -> Optional[BALayout]:
    """Build the gather layout host-side; returns None when padding would
    blow memory (fall back to segment_sum)."""
    import numpy as onp

    def table(ids, n):
        ids = onp.asarray(ids)
        counts = onp.bincount(ids, minlength=n)
        cap = max(int(counts.max()), 1)
        if cap * n > max_pad_factor * max(len(ids), 1):
            return None
        rows = onp.zeros((n, cap), onp.int32)
        mask = onp.zeros((n, cap), onp.float32)
        order = onp.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        # position within segment
        boundaries = onp.searchsorted(sorted_ids, onp.arange(n))
        pos = onp.arange(len(ids)) - boundaries[sorted_ids]
        rows[sorted_ids, pos] = order
        mask[sorted_ids, pos] = 1.0
        return rows, mask

    ct = table(obs.view_id, num_cams)
    pt = table(obs.point_id, num_points)
    it = table(obs.intr_id, num_intrinsics)
    if ct is None or pt is None or it is None:
        return None
    return BALayout(jnp.asarray(ct[0]), jnp.asarray(ct[1]),
                    jnp.asarray(pt[0]), jnp.asarray(pt[1]),
                    jnp.asarray(it[0]), jnp.asarray(it[1]))


def _reduce(per_obs, rows, mask):
    """sum_{obs in segment} per_obs[obs] via gather+sum. per_obs: (O, ...);
    rows/mask: (n, cap). Returns (n, ...)."""
    g = per_obs[rows]                              # (n, cap, ...)
    m = mask.reshape(mask.shape + (1,) * (per_obs.ndim - 1))
    return jnp.sum(g * m, axis=1)
