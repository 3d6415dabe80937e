"""Secondary benchmark: bundle-adjustment LM iterations/s.

BASELINE.json's second metric ("BA iters/s at 1/N hosts"). Builds a
synthetic Tanks&Temples-scale problem (300 cameras, 50k points, ~600k
observations) and times the full damped LM trial step (linearize ->
implicit-Schur CG(20) -> update) on the available backend.

Run: ``python bench_ba.py [--cams 300] [--pts 50000] [--obs-per-pt 12]``
Prints one JSON line (not driver-consumed; bench.py stays the headline).

``--mesh N`` times the observation-sharded SPMD path (shard_map + psum,
``ba/sharded.py``) over an N-device mesh instead of the single-device
trial — on this machine that means N virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N);
on a pod it is the real N-chip "BA iters/s at 1/N hosts" number.
"""

import argparse
import json
import time

import numpy as np


def build_problem(n_cams, n_pts, obs_per_pt, seed=0):
    import jax.numpy as jnp
    from regard3d_tpu.ba import lm
    from regard3d_tpu.core import cameras
    from regard3d_tpu.core.types import RADIAL_K3

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_pts, 3)) * [20, 15, 5] + [0, 0, 30]
    # cameras on a ring
    a = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    C = np.stack([40 * np.sin(a), rng.normal(size=n_cams),
                  30 - 40 * np.cos(a)], -1)
    Rm = np.stack([np.asarray(cameras.exp_so3(jnp.asarray([0.0, t, 0.0])))
                   for t in a])
    intr = np.zeros((1, 9), np.float32)
    intr[0, :3] = [1200.0, 960.0, 540.0]
    intr[0, 3] = -0.1

    # each point observed by obs_per_pt random cameras; cameras that see
    # the point badly (shallow/negative depth or far off-image) are
    # redrawn — a real BA problem never contains behind-camera
    # observations, and a single z~0 row would let one residual dominate
    # the cost by ~1e30 (breaking the f64-vs-f32 cost agreement the C++
    # baseline asserts on)
    O = n_pts * obs_per_pt
    pid = np.repeat(np.arange(n_pts), obs_per_pt)
    vid = rng.integers(0, n_cams, O)

    def proj_np(vid_sub, pid_sub):
        uv_s, depth_s = cameras.project(
            jnp.asarray(Rm[vid_sub]), jnp.asarray(C[vid_sub]),
            jnp.int32(RADIAL_K3), jnp.asarray(intr[0]),
            jnp.asarray(X[pid_sub]))
        return np.array(uv_s), np.array(depth_s)

    uv, depth = proj_np(vid, pid)
    for _ in range(64):
        bad = ((depth < 5.0)
               | (np.abs(uv[:, 0] - intr[0, 1]) > 4 * intr[0, 0])
               | (np.abs(uv[:, 1] - intr[0, 2]) > 4 * intr[0, 0]))
        if not bad.any():
            break
        vid[bad] = rng.integers(0, n_cams, int(bad.sum()))
        uv[bad], depth[bad] = proj_np(vid[bad], pid[bad])
    uv = uv + rng.normal(size=(O, 2)) * 0.5

    obs = lm.BAObservations(
        view_id=jnp.asarray(vid, jnp.int32),
        intr_id=jnp.zeros((O,), jnp.int32),
        point_id=jnp.asarray(pid, jnp.int32),
        model=jnp.full((O,), RADIAL_K3, jnp.int32),
        xy=jnp.asarray(uv, jnp.float32),
        weight=jnp.ones((O,), jnp.float32))
    state = lm.BAState(
        R=jnp.asarray(Rm + rng.normal(size=Rm.shape) * 0.001, jnp.float32),
        C=jnp.asarray(C + rng.normal(size=C.shape) * 0.02, jnp.float32),
        intr=jnp.asarray(intr),
        X=jnp.asarray(X + rng.normal(size=X.shape) * 0.02, jnp.float32))
    return state, obs


def run_cpp_baseline(args):
    """Dump the identical problem in the lm_baseline binary format, build
    the baseline if needed (g++ -O3 -march=native -fopenmp), run it."""
    import os
    import struct
    import subprocess
    import tempfile

    import jax
    jax.config.update("jax_platforms", "cpu")   # problem gen only
    state, obs = build_problem(args.cams, args.pts, args.obs_per_pt)

    here = os.path.dirname(os.path.abspath(__file__))
    exe = os.path.join(here, "native", "lm_baseline")
    src = os.path.join(here, "native", "lm_baseline.cpp")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O3", "-march=native", "-fopenmp",
                        "-std=c++17", src, "-o", exe], check=True)

    O = int(obs.xy.shape[0])
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(struct.pack("<6i", args.cams, args.pts, O, args.cg,
                            args.iters, args.rounds))
        f.write(np.asarray(state.R, np.float64).tobytes())
        f.write(np.asarray(state.C, np.float64).tobytes())
        f.write(np.asarray(state.intr[0], np.float64).tobytes())
        f.write(np.asarray(state.X, np.float64).tobytes())
        f.write(np.asarray(obs.view_id, np.int32).tobytes())
        f.write(np.asarray(obs.point_id, np.int32).tobytes())
        f.write(np.asarray(obs.xy, np.float64).tobytes())
        path = f.name
    try:
        out = subprocess.run([exe, path], capture_output=True, text=True,
                             check=True, timeout=1800)
        r = json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        os.unlink(path)
    assert r["cost1"] < r["cost0"], r       # the trial must descend
    print(json.dumps({
        "metric": "ba_lm_iters_per_s_cpp_baseline",
        "value": r["iters_per_s"],
        "unit": (f"compiled C++ Schur-LM trial steps/s ({args.cams} cams, "
                 f"{args.pts} pts, {O} obs, CG{args.cg}, double precision, "
                 f"{r['threads']} OpenMP threads)"),
        "backend": "cpp",
        "ms_per_iter": r["ms_per_iter"],
        "cost0": r["cost0"], "cost1": r["cost1"],
    }))


def make_point_sharded_trial(state, obs, opts, fixed, n_cams, mesh_n,
                             verbose=False):
    """Build the point-block-sharded LM trial over an `obs` mesh axis.

    Returns ``(trial, placed_state)`` where ``trial(state, lam)`` runs one
    damped LM trial step; ``trial.jitted`` / ``trial.example_args`` expose
    the underlying jitted program + its concrete (sharded) arguments so
    compile-time analysis (regard3d_tpu/ba/dossier.py) can lower EXACTLY
    the program the benchmark times."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from regard3d_tpu.ba import lm, sharded

    mesh = Mesh(np.asarray(jax.devices()[:mesh_n]), ("obs",))
    part = sharded.partition_by_point(obs, state.X, mesh_n,
                                      num_cams=n_cams, num_intrinsics=1)
    intr_models = jnp.zeros((1,), jnp.int32).at[obs.intr_id].set(obs.model)
    imask = lm._intr_dof_mask(intr_models, opts.refine_intrinsics,
                              state.X.dtype)
    repl, shrd = P(), P("obs")
    obs_spec = lm.BAObservations(view_id=shrd, intr_id=shrd, point_id=shrd,
                                 model=shrd, xy=shrd, weight=shrd)
    state_spec = lm.BAState(R=repl, C=repl, intr=repl, X=shrd)
    layout = part.layout
    if verbose:
        print("# point-sharded layout:",
              "gather" if layout is not None else "segment_sum",
              f"Lloc={part.Lloc} Omax={part.Omax}")
    lay_spec = lm.BALayout(*(shrd,) * 6) if layout is not None else None

    def body(state, lam, obs_shard, lay):
        if lay is not None:
            lay = lm.BALayout(*(a[0] for a in lay))
        return lm.lm_trial(state, lam, obs_shard, opts, fixed, imask,
                           axis_name="obs", layout=lay,
                           point_axis_name=None)

    put = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, shrd)), t)
    if layout is not None:
        trial_ = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(state_spec, repl, obs_spec, lay_spec),
            out_specs=state_spec))
        sh_obs, sh_lay = put(part.obs), put(layout)
        trial = lambda s, lam: trial_(s, lam, sh_obs, sh_lay)
        extra = (sh_obs, sh_lay)
    else:
        trial_ = jax.jit(jax.shard_map(
            lambda s, lam, o: body(s, lam, o, None), mesh=mesh,
            in_specs=(state_spec, repl, obs_spec),
            out_specs=state_spec))
        sh_obs = put(part.obs)
        trial = lambda s, lam: trial_(s, lam, sh_obs)
        extra = (sh_obs,)
    placed = lm.BAState(R=state.R, C=state.C, intr=state.intr,
                        X=jax.device_put(part.X,
                                         NamedSharding(mesh, shrd)))
    trial.jitted = trial_
    trial.example_args = (placed, jnp.float32(1e-4)) + extra
    return trial, placed


def make_obs_sharded_trial(state, obs, opts, fixed, mesh_n):
    """Build the observation-sharded (replicated-state) LM trial; same
    return contract as ``make_point_sharded_trial``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from regard3d_tpu.ba import lm, sharded

    mesh = Mesh(np.asarray(jax.devices()[:mesh_n]), ("obs",))
    obs = sharded.shard_observations(obs, mesh)
    intr_models = jnp.zeros((1,), jnp.int32).at[obs.intr_id].set(obs.model)
    imask = lm._intr_dof_mask(intr_models, opts.refine_intrinsics,
                              state.X.dtype)
    repl, shrd = P(), P("obs")
    obs_spec = lm.BAObservations(view_id=shrd, intr_id=shrd, point_id=shrd,
                                 model=shrd, xy=shrd, weight=shrd)
    state_spec = lm.BAState(R=repl, C=repl, intr=repl, X=repl)

    def body(state, lam, obs_shard):
        return lm.lm_trial(state, lam, obs_shard, opts, fixed, imask,
                           axis_name="obs")

    trial_ = jax.jit(jax.shard_map(body, mesh=mesh,
                                   in_specs=(state_spec, repl, obs_spec),
                                   out_specs=state_spec))
    sh_obs = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, shrd)), obs)
    trial = lambda s, lam: trial_(s, lam, sh_obs)
    trial.jitted = trial_
    trial.example_args = (state, jnp.float32(1e-4), sh_obs)
    return trial, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=300)
    ap.add_argument("--pts", type=int, default=50000)
    ap.add_argument("--obs-per-pt", type=int, default=12)
    ap.add_argument("--cg", type=int, default=20)
    ap.add_argument("--mesh", type=int, default=0,
                    help="N devices: time the shard_map/psum sharded path")
    ap.add_argument("--point-sharded", action="store_true",
                    help="with --mesh: landmark-block sharding (X and all "
                         "per-point reductions local; only the (V,6)+(K,9) "
                         "camera system is psum'd) instead of the "
                         "replicated-state observation sharding")
    ap.add_argument("--iters", type=int, default=10,
                    help="trial steps per timing round")
    ap.add_argument("--rounds", type=int, default=3,
                    help="timing rounds (minimum taken)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (comparable-backend scaling "
                         "points: the 1-dev vs mesh-N curve must share a "
                         "backend to mean anything)")
    ap.add_argument("--cpp", action="store_true",
                    help="time the compiled C++ Schur-LM baseline "
                         "(native/lm_baseline.cpp — the Ceres stand-in of "
                         "BASELINE.md's BA row) on the identical problem")
    args = ap.parse_args()

    if args.cpp:
        return run_cpp_baseline(args)

    import os
    if args.mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()

    import jax
    if args.cpu or (args.mesh > 1
                    and os.environ.get("R3D_BENCH_REAL_MESH") != "1"):
        # must run BEFORE backend init (first jax.devices() call); the axon
        # plugin ignores the JAX_PLATFORMS env var, only the config works.
        # Set R3D_BENCH_REAL_MESH=1 on a pod with N real chips.
        jax.config.update("jax_platforms", "cpu")
    if args.mesh and len(jax.devices()) < args.mesh:
        raise SystemExit(
            f"--mesh {args.mesh} needs {args.mesh} devices, "
            f"have {len(jax.devices())} on {jax.default_backend()}")
    # production config: f32 matmuls + persistent compile cache (same
    # settings the CLI applies)
    from regard3d_tpu import runtime
    runtime.setup()
    import jax.numpy as jnp
    from regard3d_tpu.ba import lm

    state, obs = build_problem(args.cams, args.pts, args.obs_per_pt)
    fixed = jnp.zeros((args.cams,), bool).at[0].set(True)
    intr_mask = jnp.zeros((1, 9), bool)
    opts = lm.BAOptions(cg_iterations=args.cg)

    if args.mesh and args.point_sharded:
        trial, state = make_point_sharded_trial(
            state, obs, opts, fixed, args.cams, args.mesh, verbose=True)
    elif args.mesh:
        trial, state = make_obs_sharded_trial(
            state, obs, opts, fixed, args.mesh)
    else:
        layout = lm.make_layout(obs, args.cams, args.pts, 1)
        print("# layout:", "gather" if layout is not None else "segment_sum")

        @jax.jit
        def trial(state, lam):
            return lm.lm_trial(state, lam, obs, opts, fixed, intr_mask,
                               layout=layout)

    def sync(st):
        # axon's block_until_ready returns immediately; a host fetch of one
        # element fences all queued in-order work
        np.asarray(jnp.ravel(st.X)[0])

    lam = jnp.float32(1e-4)
    out = trial(state, lam)
    sync(out)
    # best-of-3 rounds: this host has 2 cores and visible scheduler noise
    # (single-round numbers vary up to 1.6x), the minimum is the honest
    # hardware capability
    iters = args.iters
    dt = float("inf")
    for _ in range(args.rounds):
        cur = state
        t0 = time.time()
        for _ in range(iters):
            cur = trial(cur, lam)
        sync(cur)
        dt = min(dt, (time.time() - t0) / iters)

    O = obs.xy.shape[0]
    print(json.dumps({
        "metric": "ba_lm_iters_per_s",
        "value": round(1.0 / dt, 3),
        "unit": (f"LM trial steps/s ({args.cams} cams, {args.pts} pts, "
                 f"{O} obs, CG{args.cg})"),
        "backend": jax.default_backend(),
        "mesh_devices": args.mesh or 1,
        "sharding": ("point-block" if args.point_sharded
                     else ("obs" if args.mesh else "none")),
        "ms_per_iter": round(dt * 1e3, 1),
        # landmark-proportional state one device must hold during a trial
        # (X + gradient + V-block + its damped inverse = 24 f32/landmark):
        # point-block sharding keeps O(L/N), every other mode O(L)
        "landmark_state_bytes_per_device": int(
            24 * 4 * (np.ceil(args.pts / args.mesh)
                      if args.point_sharded and args.mesh else args.pts)),
    }))


if __name__ == "__main__":
    main()
