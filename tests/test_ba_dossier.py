"""Distributed-BA collective accounting (regard3d_tpu/ba/dossier.py).

The multi-chip claim the dossier certifies: point-block sharding's per-
CG-step communication is INDEPENDENT of the landmark count, while the
observation-sharded path psums an (L,3) tensor every matvec (SURVEY.md
§2.3 P6 — the scaling replacement for the reference's shared-memory Ceres
BA, /root/reference/src/CMakeLists.txt:315).  Verified here against the
optimized HLO XLA actually emits on a 2-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench_ba
from regard3d_tpu.ba import dossier, lm


def _compiled(path, n_cams, n_pts, cg=3, mesh_n=2):
    state, obs = bench_ba.build_problem(n_cams, n_pts, 4)
    fixed = jnp.zeros((n_cams,), bool).at[0].set(True)
    opts = lm.BAOptions(cg_iterations=cg)
    if path == "obs":
        trial, _ = bench_ba.make_obs_sharded_trial(
            state, obs, opts, fixed, mesh_n)
    else:
        trial, _ = bench_ba.make_point_sharded_trial(
            state, obs, opts, fixed, n_cams, mesh_n)
    return trial.jitted.lower(*trial.example_args).compile()


@pytest.mark.parametrize("path", ["obs", "point"])
def test_collectives_parsed(path):
    s = dossier.collective_summary(_compiled(path, 12, 512))
    assert s["num_collectives"] >= 2
    # every trial psums at least the scalar cost + the camera system
    if path == "obs":
        assert s["per_cg_step_bytes"] > 0


def test_point_sharded_per_cg_bytes_independent_of_L():
    """The headline claim, measured: growing L 4x leaves the point-sharded
    per-CG-step payload EXACTLY unchanged, while the obs-sharded payload
    grows with L."""
    V, K, cg = 12, 1, 3
    s_obs_small = dossier.collective_summary(_compiled("obs", V, 512, cg))
    s_obs_big = dossier.collective_summary(_compiled("obs", V, 2048, cg))
    s_pt_small = dossier.collective_summary(_compiled("point", V, 512, cg))
    s_pt_big = dossier.collective_summary(_compiled("point", V, 2048, cg))

    assert (s_pt_small["per_cg_step_bytes"]
            == s_pt_big["per_cg_step_bytes"])
    growth = (s_obs_big["per_cg_step_bytes"]
              - s_obs_small["per_cg_step_bytes"])
    # the (L,3) f32 psum grows by 3*4*(2048-512) bytes
    assert growth == 3 * 4 * (2048 - 512)

    # and the analytic table agrees with the measured payloads
    for L, s_obs, s_pt in ((512, s_obs_small, s_pt_small),
                           (2048, s_obs_big, s_pt_big)):
        a = dossier.analytic_collectives(V, L, K, cg)
        assert (s_obs["per_cg_step_bytes"]
                == a["obs_sharded"]["per_cg_step_bytes"])
        assert (s_pt["per_cg_step_bytes"]
                == a["point_sharded"]["per_cg_step_bytes"])


def test_obs_sharded_emits_L3_allreduce():
    recs = dossier.hlo_collectives(_compiled("obs", 12, 512))
    shapes = {sh for r in recs for sh in r["shapes"]}
    assert "f32[512,3]" in shapes
    pt_recs = dossier.hlo_collectives(_compiled("point", 12, 512))
    pt_shapes = {sh for r in pt_recs for sh in r["shapes"]}
    assert not any("512" in s or "256" in s for s in pt_shapes)


def test_memory_report_fields():
    m = dossier.memory_report(_compiled("point", 12, 512))
    assert m["argument_bytes"] > 0
    assert m["peak_bytes"] >= m["argument_bytes"]
