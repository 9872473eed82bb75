"""Multi-host (multi-process) data parallelism.

The reference is a single-process, single-device system; its only
"distribution" is the FastRPC offload boundary to the DSP
(`CPUBackend.cpp:341-452`). The TPU rebuild's declared new scaling axis
(SURVEY.md sections 2.10, 5.8, 7 step 4) is data parallelism across hosts:
`jax.distributed` + a process-spanning mesh + the same shard_map train step
used on a single host — the bit-identical numerics contract
(parallel/sharded_step.py) carries over unchanged because every collective
(pmax of |acc|, psum of int32 accumulators, batch statistics) is over the
same global 'data' axis regardless of how many processes back it.

Layout: the data axis is process-major (host 0's devices first), so
gradient allreduces ride intra-host ICI first and cross hosts once —
XLA's hierarchical collectives exploit this automatically.

Degrades gracefully: with no coordinator configured, `initialize()` is a
no-op and everything below runs single-process (the mesh is then just
jax.devices()).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime. No-op when single-process.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so a
    launcher can configure workers purely through the environment."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or (num_processes or 1) <= 1:
        return
    if _initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def make_global_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices, data axis
    process-major (cross-host hops happen once per hierarchical allreduce),
    model axis within a host (latency-sensitive collectives stay on ICI)."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by n_model={n_model}"
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[start, stop) rows of the global batch this process feeds.

    The loader on each host materializes only its slice — the per-host
    sharded data loading of SURVEY section 7 step 4."""
    p, n = jax.process_index(), jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes"
    )
    per = global_batch // n
    return p * per, (p + 1) * per


def shard_host_batch(mesh: Mesh, *local_arrays) -> Tuple[jax.Array, ...]:
    """Assemble global batch-sharded arrays from per-process local slices.

    Single-process this is exactly sharded_step.shard_batch; multi-process
    each host contributes its `local_batch_slice` rows."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays
    )


def replicate_global(mesh: Mesh, tree):
    """Replicate a host-identical pytree (params) across all processes'
    devices. Every process must hold the same values (true by construction:
    identical seeded init, identical integer updates)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)
