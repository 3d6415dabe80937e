"""1000-view scale probe toward the Rome16K axis (BASELINE.md:24).

Pushes the stress suite one order past the 150-view city test: ~1000 views
and >1M observations through the native union-find tracks builder,
``make_layout`` (including the hub-camera skew that forces the
``max_pad_factor`` segment-sum fallback), and ONE sharded LM trial step on
the 8-virtual-device mesh — asserting host memory stays bounded.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regard3d_tpu.ba import lm
from regard3d_tpu.core.types import PINHOLE
from regard3d_tpu.sfm import tracks as tracks_mod


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def synth_big(rng, V=1000, T=150_000, obs_per_track=7):
    """Synthetic match-graph + BA problem: V views on a ring, each track
    seen by ``obs_per_track`` nearby views (>=1M observations)."""
    O = T * obs_per_track
    base = rng.integers(0, V, T)
    off = rng.integers(0, 12, (T, obs_per_track))
    vid = ((base[:, None] + off) % V).reshape(-1).astype(np.int32)
    tid = np.repeat(np.arange(T, dtype=np.int32), obs_per_track)
    return vid, tid, O


@pytest.mark.slow
def test_thousand_view_tracks_and_sharded_ba_step(rng):
    rss0 = _rss_mb()
    V, T = 1000, 150_000
    vid, tid, O = synth_big(rng, V, T)

    # --- tracks through the native union-find: pairwise matches between
    # consecutive ring views referencing per-view feature slots
    feat = np.zeros(O, np.int64)
    order = np.argsort(vid, kind="stable")
    counts = np.bincount(vid, minlength=V)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    feat[order] = np.arange(O) - starts[vid[order]]
    # matches dict for ~3k consecutive pairs from shared tracks
    matches = {}
    by_view = {}
    for v in range(V):
        sel = np.where(vid == v)[0]
        by_view[v] = dict(zip(tid[sel].tolist(), feat[sel].tolist()))
    for v in range(V):
        w = (v + 1) % V
        common = by_view[v].keys() & by_view[w].keys()
        if common:
            matches[(v, w)] = np.asarray(
                [[by_view[v][t], by_view[w][t]] for t in common],
                np.int64)
    table = tracks_mod.build_tracks(matches, min_length=2)
    assert table.track_id.shape[0] > 0.5 * sum(
        len(m) for m in matches.values())

    # --- BA layout: balanced problem uses the gather layout; a hub-skewed
    # problem (one camera sees half of all observations) must fall back
    layout = lm.make_layout(
        lm.BAObservations(
            view_id=jnp.asarray(vid), intr_id=jnp.zeros(O, jnp.int32),
            point_id=jnp.asarray(tid), model=jnp.full(O, PINHOLE, jnp.int32),
            xy=jnp.zeros((O, 2), jnp.float32),
            weight=jnp.ones(O, jnp.float32)),
        V, T, 1)
    assert layout is not None, "balanced problem should use gather layout"
    vid_hub = vid.copy()
    vid_hub[: O // 2] = 0
    layout_hub = lm.make_layout(
        lm.BAObservations(
            view_id=jnp.asarray(vid_hub), intr_id=jnp.zeros(O, jnp.int32),
            point_id=jnp.asarray(tid), model=jnp.full(O, PINHOLE, jnp.int32),
            xy=jnp.zeros((O, 2), jnp.float32),
            weight=jnp.ones(O, jnp.float32)),
        V, T, 1)
    assert layout_hub is None, "hub skew must trigger segment-sum fallback"

    # --- one sharded LM trial step on the 8-device mesh
    from jax.sharding import Mesh
    from regard3d_tpu.ba import sharded
    from regard3d_tpu.core import cameras

    X = rng.normal(size=(T, 3)).astype(np.float32) * [20, 15, 5] + [0, 0, 30]
    a = np.linspace(0, 2 * np.pi, V, endpoint=False)
    C = np.stack([40 * np.sin(a), np.zeros(V), 30 - 40 * np.cos(a)],
                 -1).astype(np.float32)
    Rm = np.stack([np.asarray(cameras.exp_so3(jnp.asarray([0.0, t, 0.0])))
                   for t in a]).astype(np.float32)
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [900.0, 500.0, 500.0]
    uv, _ = cameras.project(jnp.asarray(Rm[vid]), jnp.asarray(C[vid]),
                            jnp.int32(PINHOLE), jnp.asarray(intr[0]),
                            jnp.asarray(X[tid]))
    obs = lm.BAObservations(
        view_id=jnp.asarray(vid), intr_id=jnp.zeros(O, jnp.int32),
        point_id=jnp.asarray(tid), model=jnp.full(O, PINHOLE, jnp.int32),
        xy=jnp.asarray(uv), weight=jnp.ones(O, jnp.float32))
    state = lm.BAState(R=jnp.asarray(Rm), C=jnp.asarray(C),
                       intr=jnp.asarray(intr),
                       X=jnp.asarray(X + rng.normal(size=X.shape) * 0.01,
                                     jnp.float32))
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("obs",))
    fixed = jnp.zeros((V,), bool).at[0].set(True)
    out, stats = sharded.bundle_adjust_sharded(
        state, obs, mesh, lm.BAOptions(max_iterations=1, cg_iterations=5),
        fixed_pose_mask=fixed)
    assert np.isfinite(float(stats.final_cost))

    # memory bounded: the whole probe (1M+ obs, layouts, one sharded step)
    # must stay within a few GB of host RSS
    assert _rss_mb() - rss0 < 6000, (_rss_mb(), rss0)
