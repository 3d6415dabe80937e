"""Device mesh utilities — the framework's distributed runtime surface.

The reference is a single-host app whose concurrency is threads + OpenMP
(SURVEY.md §2.3); here scale comes from a `jax.sharding.Mesh`:

* axis ``images`` — data parallelism over image batches (feature stage, P1);
* axis ``pairs``  — pair-block parallelism for matching/filtering (P2);
* axis ``obs``    — observation shards for distributed BA (P6).

A single physical mesh is reused with logical axis names; on CPU test
backends `make_mesh` virtualizes over `xla_force_host_platform_device_count`
devices. Multi-host initialization goes through `init_distributed`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host runtime init (no-op on a single process)."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(axis_name: str = "obs", devices=None) -> Mesh:
    """1-D mesh over all (local or global) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(axis_names=("images", "pairs"), shape=None,
                 devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        # favour the first axis
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (n // a, a)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def pad_to_multiple(x, multiple: int, axis: int = 0, fill=0):
    """Pad a jnp/np array so shape[axis] is a multiple (SPMD-even shards)."""
    import jax.numpy as jnp
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return jnp.pad(x, widths, constant_values=fill)


def shard_spec(mesh: Mesh, axis_name: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
