"""Multi-host (multi-process) runtime helpers.

The reference's only multi-process distribution is MPI for Ray Surveyor
(``mpiexec -n 4``, src/app.py:1310). The TPU-native equivalent is
``jax.distributed``: one process per host, collectives over ICI within a
slice and DCN across hosts, no MPI. These helpers wrap initialization and
host-level data exchange so the pipeline code stays process-count agnostic
(a single process degenerates to local execution).
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = [
    "initialize",
    "process_index",
    "process_count",
    "all_gather_arrays",
    "shard_round_robin",
]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op if already initialized / 1 process)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def shard_round_robin(items, index=None, count=None):
    """This process's share of a work list (genome data parallelism)."""
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    return [x for i, x in enumerate(items) if i % count == index]


def all_gather_arrays(array, dtype=None):
    """Gather variable-length 1D/2D host arrays from every process.

    Uses a device all_gather over padded buffers (rides DCN across hosts).
    Returns the list of per-process arrays in process order.
    """
    from jax.experimental import multihost_utils

    array = np.asarray(array)
    if dtype is not None:
        array = array.astype(dtype)
    if process_count() == 1:
        return [array]

    # Exchange sizes first, then padded payloads.
    n_local = np.array([array.shape[0]], np.int64)
    sizes = multihost_utils.process_allgather(n_local).reshape(-1)
    max_n = int(sizes.max())
    pad_shape = (max_n,) + array.shape[1:]
    padded = np.zeros(pad_shape, dtype=array.dtype)
    padded[: array.shape[0]] = array
    gathered = multihost_utils.process_allgather(padded)
    return [gathered[i, : int(sizes[i])] for i in range(process_count())]
