"""Multi-process distributed runtime proof (SURVEY.md §7 item 6).

Spawns REAL OS processes joined through ``jax.distributed`` on the CPU
backend and runs the sharded bundle adjustment across them — the
single-machine equivalent of the N-host BASELINE axis.  The final LM cost
must agree across processes and with a single-process run of the same
problem."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid, n = int(sys.argv[1]), int(sys.argv[2])
os.environ["R3D_COORDINATOR"] = sys.argv[3]
os.environ["R3D_NUM_PROCESSES"] = str(n)
os.environ["R3D_PROCESS_ID"] = str(pid)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax
jax.config.update("jax_platforms", "cpu")
from regard3d_tpu.dist import launch
assert launch.init_from_env()
assert jax.process_count() == n
assert jax.device_count() == 2 * n, jax.devices()
assert launch.is_primary() == (pid == 0)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.join(%(repo)r, "tests"))
from test_ba import synth_ba_problem
from regard3d_tpu.ba import lm, sharded
from regard3d_tpu.dist import mesh as meshlib
rng = np.random.default_rng(7)
state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=60)
mesh = meshlib.make_mesh("obs")          # spans both processes
fixed = jnp.zeros((5,), bool).at[0].set(True)
out, stats = sharded.bundle_adjust_sharded(
    state, obs, mesh, lm.BAOptions(max_iterations=8, cg_iterations=12),
    fixed_pose_mask=fixed)
print(f"R3DFINAL {float(stats.final_cost):.10f}", flush=True)
"""


def _free_port():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("R3D_COORDINATOR", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO},
             str(pid), "2", f"127.0.0.1:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
    finals = [float(re.search(r"R3DFINAL ([0-9.eE+-]+)", o).group(1))
              for o in outs]
    assert finals[0] == finals[1]       # SPMD: identical replicated result

    # single-process run of the same problem on a 4-device local mesh
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_ba import synth_ba_problem
    from regard3d_tpu.ba import lm, sharded
    from regard3d_tpu.dist import mesh as meshlib
    rng = np.random.default_rng(7)
    state, gt, obs = synth_ba_problem(rng, n_cams=5, n_pts=60)
    mesh = meshlib.make_mesh("obs", devices=jax.devices()[:4])
    fixed = jnp.zeros((5,), bool).at[0].set(True)
    out, stats = sharded.bundle_adjust_sharded(
        state, obs, mesh, lm.BAOptions(max_iterations=8, cg_iterations=12),
        fixed_pose_mask=fixed)
    # reduction order differs across topologies: allow float32 slack
    assert abs(float(stats.final_cost) - finals[0]) < 1e-3 * finals[0]


def test_launcher_env_contract(tmp_path):
    # launch_local wires the env contract and propagates the worst exit code
    from regard3d_tpu.dist import launch
    check = ("import os, sys;"
             "assert os.environ['R3D_NUM_PROCESSES'] == '2';"
             "assert os.environ['R3D_COORDINATOR'].startswith('127.0.0.1:');"
             "assert 'xla_force_host_platform_device_count=3' "
             "in os.environ['XLA_FLAGS'];")
    rc = launch.launch_local(2, ["-c", check + "sys.exit(0)"], module=None,
                             devices_per_process=3, log_dir=str(tmp_path))
    assert rc == 0
    rc = launch.launch_local(
        2, ["-c", check + "sys.exit(int(os.environ['R3D_PROCESS_ID']))"],
        module=None, devices_per_process=3, log_dir=str(tmp_path))
    assert rc == 1


@pytest.mark.slow
def test_two_process_matches_equals_single(tmp_path):
    """`r3d launch -n 2 -- matches` (pair-sharded across processes) must
    produce byte-identical matches.f.txt to the single-process run."""
    from PIL import Image
    from regard3d_tpu.dist import launch
    from regard3d_tpu.ingest import synth
    from regard3d_tpu.pipeline.compute_matches import load_matches_txt

    ds = synth.make_dataset("castle", n_cams=5, hw=256, seed=3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i, im in enumerate(ds["images"]):
        p = str(img_dir / f"im{i:02d}.png")
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    env.pop("R3D_COORDINATOR", None)

    def cli(*a):
        r = subprocess.run([sys.executable, "-m", "regard3d_tpu.cli", *a],
                           env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    def find_matches(proj):
        for d in sorted(os.listdir(proj)):
            full = os.path.join(proj, d)
            if d.startswith("matches") and os.path.isdir(full):
                return full
        raise AssertionError(f"no matches dir in {proj}")

    # single-process reference
    p1 = str(tmp_path / "proj1")
    cli("init", p1)
    cli("import", p1, *paths)
    cli("matches", p1, "--max-keypoints", "1024", "--ransac-iters", "256")
    f1 = load_matches_txt(os.path.join(find_matches(p1), "matches.f.txt"))

    # two coordinated processes, pair list sharded
    p2 = str(tmp_path / "proj2")
    cli("init", p2)
    cli("import", p2, *paths)
    os.environ_backup = None
    saved = {k: os.environ.get(k) for k in
             ("R3D_COORDINATOR", "PYTHONPATH", "JAX_PLATFORMS")}
    os.environ["PYTHONPATH"] = env["PYTHONPATH"]
    os.environ["R3D_LAUNCH_PLATFORM"] = "cpu"
    try:
        rc = launch.launch_local(
            2, ["matches", p2, "--max-keypoints", "1024",
                "--ransac-iters", "256"],
            devices_per_process=1, log_dir=str(tmp_path / "logs"),
            timeout=900)
    finally:
        os.environ.pop("R3D_LAUNCH_PLATFORM", None)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    md2 = find_matches(p2)
    f2 = load_matches_txt(os.path.join(md2, "matches.f.txt"))

    assert set(f1) == set(f2), (sorted(f1), sorted(f2))
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
    # the merged artifacts exist and the shard parts were written
    assert os.path.exists(os.path.join(md2, "matches.putative.txt"))
    assert os.path.exists(os.path.join(md2, "matches.f.part1.txt"))

    # P1 cross-process feature sharding: each process extracted a
    # round-robin image shard, and the resulting per-image artifacts are
    # byte-identical to the single-process run's (determinism contract;
    # src/threads/R3DFeaturesThread.cpp:58-77 parity)
    md1 = find_matches(p1)
    for i in range(len(paths)):
        for ext in ("feat", "desc"):
            fn = f"image{i:06d}.{ext}"
            with open(os.path.join(md1, fn), "rb") as fh:
                b1 = fh.read()
            with open(os.path.join(md2, fn), "rb") as fh:
                b2 = fh.read()
            assert b1 == b2, f"{fn} differs between N=1 and N=2"
