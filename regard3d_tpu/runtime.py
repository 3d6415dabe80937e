"""Process-level JAX runtime configuration shared by every entry point.

The reference records per-step wall time and re-runs interactively
(``src/R3DProject.h:171`` runningTime_); on TPU the equivalent UX killer is
XLA compile time — tens of seconds per program shape.  Every entry point
(CLI, benches, driver hooks, tests) therefore enables the persistent
compilation cache so warm reruns skip compilation entirely, and pins f32
matmul precision (the TPU default bf16 corrupts RANSAC normal equations and
BA Schur products; the matcher's fast presets opt into bf16 explicitly).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_tag() -> str:
    """Fingerprint of the host's CPU capability set.

    XLA:CPU serializes cached executables as AOT results compiled for THIS
    machine's feature flags; loading (or re-serializing alongside) entries
    produced on a different machine is undefined behaviour — observed as
    'Target machine feature ... not supported on the host machine' warnings
    and a reproducible SIGSEGV inside put_executable_and_time when a
    mixed-machine dir is reused.  Scoping the cache path by a CPU-flags
    hash makes a moved disk image start a fresh cache instead."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                flags = platform.machine()
    except OSError:
        flags = platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


DEFAULT_CACHE_DIR = os.environ.get(
    "R3D_JAX_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache",
                 f"r3d_jaxcache_{_machine_tag()}"))


def setup(cache_dir: str | None = None, precision: str = "highest") -> None:
    """Enable the persistent compilation cache + f32 matmul precision.

    Safe to call multiple times and before/after backend initialization
    (cache config keys apply at compile time, not backend-init time)."""
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the pipeline dispatches many small
        # programs whose *sum* dominates warm-start time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization — never fail the pipeline over it
    if precision:
        jax.config.update("jax_default_matmul_precision", precision)


def release_stage_memory() -> None:
    """Drop compiled-program caches + cycles at a pipeline stage boundary.

    The reference runs each step in a worker thread whose buffers die with
    the step (src/threads/R3DComputeMatchesThread.cpp lifecycle); a
    long-lived JAX process instead accumulates compiled executables —
    measured at ~1.6 GB host RSS after the matching stage of a 200-view
    run, none of it reusable by the SfM stage (different programs).  Stage
    drivers with large workloads call this between stages; the persistent
    on-disk cache (setup()) makes re-JITs of evicted programs cheap."""
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
