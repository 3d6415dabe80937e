"""Distributed bundle adjustment — observations sharded over a device mesh.

The N-host scaling star of BASELINE.json: the observation table is split
evenly across the mesh's ``obs`` axis; camera/intrinsic/point parameters
stay replicated.  Each LM trial runs as one SPMD program (``shard_map``):
devices compute their shard's Jacobian blocks and partial segment sums, a
``psum`` (riding ICI within a slice, DCN across hosts) forms the global
U / V / W products, and the CG iteration proceeds replicated & lock-step.

This is the TPU-native replacement for Ceres' shared-memory multithreaded
sparse BA (P6 in SURVEY.md §2.3) — same math, collectives instead of locks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from regard3d_tpu.ba import lm
from regard3d_tpu.dist import mesh as meshlib


def shard_observations(obs: lm.BAObservations, mesh: Mesh,
                       axis: str = "obs") -> lm.BAObservations:
    """Pad the observation table to an even multiple of the mesh axis and
    mark padding rows with zero weight."""
    n_dev = mesh.shape[axis]
    O = obs.view_id.shape[0]
    target = ((O + n_dev - 1) // n_dev) * n_dev
    pad = target - O
    if pad:
        obs = lm.BAObservations(
            view_id=meshlib.pad_to_multiple(obs.view_id, n_dev),
            intr_id=meshlib.pad_to_multiple(obs.intr_id, n_dev),
            point_id=meshlib.pad_to_multiple(obs.point_id, n_dev),
            model=meshlib.pad_to_multiple(obs.model, n_dev),
            xy=meshlib.pad_to_multiple(obs.xy, n_dev),
            weight=meshlib.pad_to_multiple(obs.weight, n_dev),  # 0-weight pad
        )
    return obs


def bundle_adjust_sharded(state: lm.BAState, obs: lm.BAObservations,
                          mesh: Mesh,
                          opts: lm.BAOptions = lm.BAOptions(),
                          fixed_pose_mask: Optional[jnp.ndarray] = None,
                          center_prior: Optional[jnp.ndarray] = None,
                          axis: str = "obs"):
    """LM bundle adjustment with the observation table sharded over `mesh`.

    Semantics identical to ``lm.bundle_adjust`` (bitwise up to psum
    reduction order)."""
    V = state.R.shape[0]
    if fixed_pose_mask is None:
        fixed_pose_mask = jnp.zeros((V,), bool)
    obs = shard_observations(obs, mesh, axis)

    K = state.intr.shape[0]
    intr_models = jnp.zeros((K,), jnp.int32).at[obs.intr_id].set(obs.model)
    intr_mask = lm._intr_dof_mask(intr_models, opts.refine_intrinsics,
                                  state.X.dtype)

    repl = P()
    shrd = P(axis)
    obs_spec = lm.BAObservations(view_id=shrd, intr_id=shrd, point_id=shrd,
                                 model=shrd, xy=shrd, weight=shrd)
    state_spec = lm.BAState(R=repl, C=repl, intr=repl, X=repl)

    def trial_body(state, lam, obs_shard):
        new_state = lm.lm_trial(state, lam, obs_shard, opts, fixed_pose_mask,
                                intr_mask, center_prior, axis_name=axis)
        cost = jax.lax.psum(
            lm.compute_cost(new_state, obs_shard, opts), axis)
        if center_prior is not None and opts.center_prior_weight > 0:
            cost = cost + opts.center_prior_weight * jnp.sum(
                (new_state.C - center_prior) ** 2)
        return new_state, cost

    trial = jax.jit(jax.shard_map(
        trial_body, mesh=mesh,
        in_specs=(state_spec, repl, obs_spec),
        out_specs=(state_spec, repl)))

    def cost_body(state, obs_shard):
        c = jax.lax.psum(lm.compute_cost(state, obs_shard, opts), axis)
        if center_prior is not None and opts.center_prior_weight > 0:
            c = c + opts.center_prior_weight * jnp.sum(
                (state.C - center_prior) ** 2)
        return c

    cost_fn = jax.jit(jax.shard_map(cost_body, mesh=mesh,
                                in_specs=(state_spec, obs_spec),
                                out_specs=repl))

    cost = float(cost_fn(state, obs))
    initial = cost
    lam = opts.init_lambda
    it = 0
    for it in range(1, opts.max_iterations + 1):
        new_state, new_cost = trial(state, jnp.asarray(lam, state.X.dtype),
                                    obs)
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
    return state, lm.BAStats(initial, cost, it, lam)
