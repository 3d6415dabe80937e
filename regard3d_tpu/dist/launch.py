"""Multi-process SPMD launcher — the multi-host runtime entry point.

The reference is a single-machine app (SURVEY.md §5: no distributed
backend); here the N-host axis of BASELINE.json comes from
``jax.distributed``.  Two pieces:

* ``launch_local(n, argv)`` — spawn ``n`` OS processes of any r3d command
  (or any python module), wiring coordinator/process-id env vars.  On real
  pods each host runs one process and the same env contract applies
  (R3D_COORDINATOR / R3D_NUM_PROCESSES / R3D_PROCESS_ID), so the local
  launcher and a SLURM/GKE launcher are interchangeable.
* ``init_from_env()`` — called by the CLI before any backend touch: joins
  the coordinated runtime when the env contract is present, else no-op.

After ``init_from_env`` every ``jax.devices()`` call sees the GLOBAL device
list, so meshes built by ``dist.mesh.make_mesh`` span processes and the
``psum``-based BA (ba/sharded.py) runs unchanged across hosts.

Multi-process execution contract (enforced by the CLI dispatcher):

* ``sfm`` is collective — with ``--dist-ba`` its final bundle adjustment
  shards over ALL processes' devices (point-block landmark sharding on a
  single process, observation sharding across processes;
  pipeline/triangulation_step.py `_dist_ba_polish`); artifact writes and
  project mutations happen on the primary only (``is_primary``);
* ``matches`` is pair-sharded — each process matches a round-robin shard
  of the pair list and writes ``matches.*.part{pid}.txt``; the primary
  extracts features, hands the step dir to secondaries through a
  token-stamped handshake file, and merges the shards
  (pipeline/compute_matches.py run_compute_matches);
* every other subcommand is host-side or local-mesh work: secondary
  processes skip it instead of racing on the same artifact files;
* stage drivers auto-build local meshes from ``jax.local_devices()``
  because their results are fetched to the local host with
  ``np.asarray``.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import List, Optional

ENV_COORD = "R3D_COORDINATOR"
ENV_NPROC = "R3D_NUM_PROCESSES"
ENV_PID = "R3D_PROCESS_ID"


def init_from_env() -> bool:
    """Join a jax.distributed runtime if the launcher env contract is set.

    Returns True when running as part of a multi-process job."""
    coord = os.environ.get(ENV_COORD)
    if not coord:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ[ENV_NPROC]),
        process_id=int(os.environ[ENV_PID]))
    return True


def is_primary() -> bool:
    """True on the process that should write artifacts / print stats."""
    if os.environ.get(ENV_COORD) is None:
        return True
    return int(os.environ.get(ENV_PID, "0")) == 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_local(num_processes: int, argv: List[str],
                 devices_per_process: int = 1,
                 log_dir: Optional[str] = None,
                 module: Optional[str] = "regard3d_tpu.cli",
                 timeout: Optional[float] = None) -> int:
    """Run ``python -m <module> <argv>`` (or bare ``python <argv>`` when
    ``module`` is None) in ``num_processes`` coordinated processes on this
    machine (CPU backend, ``devices_per_process`` virtual devices each —
    the single-machine stand-in for an N-host pod).

    Process 0 inherits stdout/stderr; others log to ``log_dir`` (or are
    silenced).  Returns the worst exit code."""
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env[ENV_COORD] = f"127.0.0.1:{port}"
        env[ENV_NPROC] = str(num_processes)
        env[ENV_PID] = str(pid)
        env["JAX_PLATFORMS"] = env.get("R3D_LAUNCH_PLATFORM", "cpu")
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count="
                            f"{devices_per_process}").strip()
        # machine-scoped cache dir: XLA:CPU caches AOT executables for the
        # compiling host's CPU flags; a cache written by a different
        # machine segfaults on load (see runtime._machine_tag)
        from regard3d_tpu.runtime import _machine_tag
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       f"/tmp/jaxcache_{_machine_tag()}")
        cmd = ([sys.executable, "-m", module] if module
               else [sys.executable]) + list(argv)
        if pid == 0 or log_dir is None:
            out = None if pid == 0 else subprocess.DEVNULL
            procs.append(subprocess.Popen(cmd, env=env, stdout=out,
                                          stderr=out))
        else:
            os.makedirs(log_dir, exist_ok=True)
            f = open(os.path.join(log_dir, f"proc{pid}.log"), "w")
            procs.append(subprocess.Popen(cmd, env=env, stdout=f,
                                          stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=timeout) for p in procs]
    return max(rcs)


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        prog="r3d-launch",
        description="run an r3d command across N coordinated processes")
    ap.add_argument("-n", "--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=1)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--module", default="regard3d_tpu.cli")
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="r3d subcommand + args to run in every process")
    args = ap.parse_args(argv)
    if not args.command:
        ap.error("no command given")
    rc = launch_local(args.num_processes, args.command,
                      devices_per_process=args.devices_per_process,
                      log_dir=args.log_dir, module=args.module)
    sys.exit(rc)


if __name__ == "__main__":
    main()
