"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
CPU backend with 8 host devices (the driver separately dry-runs
``__graft_entry__.dryrun_multichip``)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # machine env presets axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# machine-fingerprinted cache dir: XLA:CPU cached executables are AOT
# results for THIS machine's CPU flags; reusing a dir written by a
# different machine segfaults inside the cache layer (see runtime.py)
from regard3d_tpu.runtime import _machine_tag  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/jaxcache_{_machine_tag()}")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# cache every compile: the fast gate is dominated by the *sum* of many
# multi-second compiles, and warm reruns should skip all of them
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # fresh, deterministic generator per test — avoids order-dependence
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_count():
    """Free compiled executables after every test module.

    XLA:CPU segfaults (deterministically, inside backend_compile_and_load)
    once a single process accumulates enough compiled programs — observed
    at ~36% of the full suite regardless of cache state; no subset of the
    preceding modules reproduces it, only the cumulative total.  Clearing
    jit caches per module keeps the count bounded; the persistent disk
    cache makes re-tracing of shared programs cheap."""
    yield
    jax.clear_caches()
