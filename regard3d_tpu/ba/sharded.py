"""Distributed bundle adjustment over a device mesh.

The N-host scaling star of BASELINE.json (P6 in SURVEY.md §2.3 — the
TPU-native replacement for Ceres' shared-memory multithreaded sparse BA,
``/root/reference/src/CMakeLists.txt:315``): same math, collectives instead
of locks.  Two shardings:

* ``bundle_adjust_sharded`` — the round-2 **observation-sharded** path: the
  observation table is split evenly, all parameters stay replicated.  Easy
  and exact, but each CG matvec psums an (L,3) array and each linearization
  an (L,3,3) block — communication grows with the landmark count, so it
  stops scaling long before Rome16K.

* ``bundle_adjust_point_sharded`` — the production **point-block-sharded**
  path: landmarks are partitioned over the mesh and every observation row
  is co-located with its landmark.  The point state X, the V-blocks, the
  W^T x products and the back-substitution are then fully device-local;
  the only collectives are psums of the *reduced camera system* — (V,6,6)
  per linearization and (V,6)+(K,9) per CG step — which do not grow with
  L.  Per-device memory is O(L/N + O/N); the camera block (replicated) is
  tiny by comparison (cameras ≪ landmarks in any SfM problem).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as onp
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


# ---------------------------------------------------------------------------
# Point-block sharding
# ---------------------------------------------------------------------------

class PointPartition(NamedTuple):
    """Host-side plan placing each landmark (and all of its observation
    rows) on exactly one device."""
    obs: lm.BAObservations     # (N*Omax,) rows grouped by device, 0-padded;
                               # point_id is the LOCAL index within a shard
    X: jnp.ndarray             # (N*Lloc, 3) points grouped by device, padded
    global_of_slot: onp.ndarray  # (N*Lloc,) int64 global pid, -1 = padding
    n_dev: int
    Lloc: int                  # points per device (padded)
    Omax: int                  # observation rows per device (padded)
    L: int                     # original landmark count
    layout: Optional[lm.BALayout]  # stacked per-device gather tables
                               # (leading dim N on every array) or None


def _snake_assign(order: onp.ndarray, n_dev: int) -> onp.ndarray:
    """Boustrophedon round-robin: 0..N-1, N-1..0, ... — balances a
    count-sorted list across devices to within one item's weight."""
    n = len(order)
    pat = onp.concatenate([onp.arange(n_dev), onp.arange(n_dev)[::-1]])
    dev = onp.empty(n, onp.int32)
    dev[order] = pat[onp.arange(n) % (2 * n_dev)]
    return dev


def _segment_positions(sorted_ids: onp.ndarray, n_seg: int) -> onp.ndarray:
    """Position of each element within its (sorted) segment."""
    starts = onp.searchsorted(sorted_ids, onp.arange(n_seg))
    return onp.arange(len(sorted_ids)) - starts[sorted_ids]


def _stacked_layout(vid, iid, lpid, dev, Od, V, K, Lloc, n_dev, Omax,
                    max_pad_factor: float = 4.0) -> Optional[lm.BALayout]:
    """Per-device gather-reduction tables with device-uniform caps, stacked
    on a leading mesh axis.  Row indices are LOCAL (0..Omax-1)."""
    def build(ids, n):
        caps = []
        per_dev = []
        for d in range(n_dev):
            sel = onp.nonzero(dev == d)[0]
            ids_d = ids[sel]
            local = sel_local[sel]
            counts = onp.bincount(ids_d, minlength=n) if len(ids_d) else \
                onp.zeros(n, onp.int64)
            caps.append(max(int(counts.max()) if len(ids_d) else 1, 1))
            per_dev.append((ids_d, local))
        cap = max(caps)
        if cap * n * n_dev > max_pad_factor * max(len(ids), 1) + 64 * n_dev:
            return None
        rows = onp.zeros((n_dev, n, cap), onp.int32)
        mask = onp.zeros((n_dev, n, cap), onp.float32)
        for d, (ids_d, local) in enumerate(per_dev):
            if not len(ids_d):
                continue
            order = onp.argsort(ids_d, kind="stable")
            s_ids = ids_d[order]
            pos = _segment_positions(s_ids, n)
            rows[d, s_ids, pos] = local[order]
            mask[d, s_ids, pos] = 1.0
        return rows, mask

    # local row index of every observation within its device block
    order_dev = onp.argsort(dev, kind="stable")
    sel_local = onp.empty(len(dev), onp.int64)
    sel_local[order_dev] = _segment_positions(dev[order_dev], n_dev)

    ct = build(vid, V)
    pt = build(lpid, Lloc)
    it = build(iid, K)
    if ct is None or pt is None or it is None:
        return None
    return lm.BALayout(jnp.asarray(ct[0]), jnp.asarray(ct[1]),
                       jnp.asarray(pt[0]), jnp.asarray(pt[1]),
                       jnp.asarray(it[0]), jnp.asarray(it[1]))


def partition_by_point(obs: lm.BAObservations, X, n_dev: int,
                       build_layout: bool = True,
                       num_cams: Optional[int] = None,
                       num_intrinsics: Optional[int] = None
                       ) -> PointPartition:
    """Partition landmarks across ``n_dev`` devices (balanced by observation
    count via snake round-robin) and group the observation table so each
    device's rows reference only its own landmark block."""
    pid = onp.asarray(obs.point_id)
    L = int(onp.asarray(X).shape[0])
    counts = onp.bincount(pid, minlength=L)
    dev_of_point = _snake_assign(onp.argsort(-counts, kind="stable"), n_dev)

    # local slot of each point within its device
    p_order = onp.argsort(dev_of_point, kind="stable")
    Ld = onp.bincount(dev_of_point, minlength=n_dev)
    Lloc = max(int(Ld.max()), 1)
    local_of_point = onp.empty(L, onp.int64)
    local_of_point[p_order] = _segment_positions(dev_of_point[p_order], n_dev)
    global_of_slot = onp.full(n_dev * Lloc, -1, onp.int64)
    global_of_slot[dev_of_point.astype(onp.int64) * Lloc
                   + local_of_point] = onp.arange(L)

    Xp = onp.zeros((n_dev * Lloc, 3), onp.asarray(X).dtype)
    live = global_of_slot >= 0
    Xp[live] = onp.asarray(X)[global_of_slot[live]]

    # observations follow their point's device
    dev_of_obs = dev_of_point[pid]
    Od = onp.bincount(dev_of_obs, minlength=n_dev)
    Omax = max(int(Od.max()), 1)
    o_order = onp.argsort(dev_of_obs, kind="stable")
    o_pos = _segment_positions(dev_of_obs[o_order], n_dev)
    slot = dev_of_obs[o_order].astype(onp.int64) * Omax + o_pos

    def place(arr, fill=0):
        a = onp.asarray(arr)
        out = onp.full((n_dev * Omax,) + a.shape[1:], fill, a.dtype)
        out[slot] = a[o_order]
        return jnp.asarray(out)

    obs_p = lm.BAObservations(
        view_id=place(obs.view_id),
        intr_id=place(obs.intr_id),
        point_id=place(local_of_point[pid].astype(onp.int32)),
        model=place(obs.model),
        xy=place(obs.xy),
        weight=place(obs.weight))          # padding rows get weight 0

    layout = None
    if build_layout:
        V = num_cams or int(onp.asarray(obs.view_id).max()) + 1
        K = num_intrinsics or int(onp.asarray(obs.intr_id).max()) + 1
        layout = _stacked_layout(
            onp.asarray(obs.view_id), onp.asarray(obs.intr_id),
            local_of_point[pid], dev_of_obs, Od, V, K, Lloc, n_dev, Omax)

    return PointPartition(obs_p, jnp.asarray(Xp), global_of_slot,
                          n_dev, Lloc, Omax, L, layout)


def bundle_adjust_point_sharded(
        state: lm.BAState, obs: lm.BAObservations, mesh: Mesh,
        opts: lm.BAOptions = lm.BAOptions(),
        fixed_pose_mask: Optional[jnp.ndarray] = None,
        center_prior: Optional[jnp.ndarray] = None,
        axis: str = "obs",
        partition: Optional[PointPartition] = None):
    """LM bundle adjustment with landmarks block-sharded over ``mesh``.

    Communication per CG step is a psum of (V,6)+(K,9) — independent of the
    landmark count — so this is the path that scales to Rome16K-size
    problems.  Results match ``lm.bundle_adjust`` up to reduction order."""
    V = state.R.shape[0]
    if fixed_pose_mask is None:
        fixed_pose_mask = jnp.zeros((V,), bool)
    n_dev = mesh.shape[axis]
    if partition is None:
        partition = partition_by_point(obs, state.X, n_dev,
                                       num_cams=V,
                                       num_intrinsics=state.intr.shape[0])

    K = state.intr.shape[0]
    intr_models = jnp.zeros((K,), jnp.int32).at[obs.intr_id].set(obs.model)
    intr_mask = lm._intr_dof_mask(intr_models, opts.refine_intrinsics,
                                  state.X.dtype)

    repl, shrd = P(), P(axis)
    obs_spec = lm.BAObservations(view_id=shrd, intr_id=shrd, point_id=shrd,
                                 model=shrd, xy=shrd, weight=shrd)
    state_spec = lm.BAState(R=repl, C=repl, intr=repl, X=shrd)
    layout = partition.layout
    layout_spec = (lm.BALayout(*(shrd,) * 6) if layout is not None else None)

    def trial_body(st, lam, obs_shard, lay):
        if lay is not None:
            lay = lm.BALayout(*(a[0] for a in lay))   # drop mesh dim
        new_state = lm.lm_trial(st, lam, obs_shard, opts, fixed_pose_mask,
                                intr_mask, center_prior, axis_name=axis,
                                layout=lay, point_axis_name=None)
        cost = jax.lax.psum(
            lm.compute_cost(new_state, obs_shard, opts), axis)
        if center_prior is not None and opts.center_prior_weight > 0:
            cost = cost + opts.center_prior_weight * jnp.sum(
                (new_state.C - center_prior) ** 2)
        return new_state, cost

    def cost_body(st, obs_shard):
        c = jax.lax.psum(lm.compute_cost(st, obs_shard, opts), axis)
        if center_prior is not None and opts.center_prior_weight > 0:
            c = c + opts.center_prior_weight * jnp.sum(
                (st.C - center_prior) ** 2)
        return c

    # place the static tables with their final sharding ONCE — otherwise
    # every trial pays a full reshard of the observation/layout arrays
    sh_obs = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, shrd)),
        partition.obs)
    sh_lay = (jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, shrd)), layout)
        if layout is not None else None)

    if layout is not None:
        trial = jax.jit(jax.shard_map(
            trial_body, mesh=mesh,
            in_specs=(state_spec, repl, obs_spec, layout_spec),
            out_specs=(state_spec, repl)))
        trial_fn = lambda s, lam: trial(s, lam, sh_obs, sh_lay)
    else:
        trial = jax.jit(jax.shard_map(
            lambda s, lam, o: trial_body(s, lam, o, None), mesh=mesh,
            in_specs=(state_spec, repl, obs_spec),
            out_specs=(state_spec, repl)))
        trial_fn = lambda s, lam: trial(s, lam, sh_obs)

    cost_fn = jax.jit(jax.shard_map(cost_body, mesh=mesh,
                                    in_specs=(state_spec, obs_spec),
                                    out_specs=repl))

    sh_state = lm.BAState(
        R=state.R, C=state.C, intr=state.intr,
        X=jax.device_put(partition.X, NamedSharding(mesh, shrd)))

    cost = float(cost_fn(sh_state, sh_obs))
    initial = cost
    lam = opts.init_lambda
    it = 0
    for it in range(1, opts.max_iterations + 1):
        new_state, new_cost = trial_fn(sh_state,
                                       jnp.asarray(lam, state.X.dtype))
        new_cost = float(new_cost)
        if jnp.isfinite(new_cost) and new_cost < cost:
            rel = (cost - new_cost) / max(cost, 1e-30)
            sh_state = new_state
            cost = new_cost
            lam = max(lam * opts.lambda_down, opts.min_lambda)
            if rel < opts.ftol:
                break
        else:
            lam = lam * opts.lambda_up
            if lam > opts.max_lambda:
                break

    # un-permute the landmark block back to the caller's point numbering
    Xp = onp.asarray(sh_state.X)
    Xout = onp.asarray(state.X).copy()
    live = partition.global_of_slot >= 0
    Xout[partition.global_of_slot[live]] = Xp[live]
    out = lm.BAState(R=sh_state.R, C=sh_state.C, intr=sh_state.intr,
                     X=jnp.asarray(Xout))
    return out, lm.BAStats(initial, cost, it, lam)
