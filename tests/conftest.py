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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

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
