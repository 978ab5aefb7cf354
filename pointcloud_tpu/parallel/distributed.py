"""Multi-host (DCN) initialization helpers (SURVEY.md §2.3: the TPU-native
replacement for a NCCL/MPI communication backend is jax.distributed +
NamedSharding — XLA compiles the collectives; there is no comm library).

Single-slice multi-chip needs nothing: `jax.devices()` sees every chip over
ICI. Across hosts/slices call `initialize()` once per process before any
JAX computation, then build meshes with `global_mesh`.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Join the multi-host JAX runtime (no-op on a single host).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud auto-detection.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return False  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis_names=("data",), shape=None):
    """Mesh over ALL global devices (every host's chips).

    shape: optional tuple matching axis_names; defaults to 1-D over all
    devices. Data-parallel training then shards batches with
    parallel.shard_batch and replicates params — XLA routes the gradient
    psum over ICI within a slice and DCN across slices.
    """
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if shape is not None:
        devices = devices.reshape(shape)
    return Mesh(devices, axis_names)


def process_local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of a global batch this process should load
    (host-sharded input pipeline)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
