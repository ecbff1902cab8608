"""Multi-host (DCN) support: ``jax.distributed`` init + per-process data.

The reference is strictly single-process/single-GPU (SURVEY.md section 2.5);
this module is the scale-out path it lacked, per SURVEY section 2.5's
"DCN only if multi-host is ever added". Design follows the standard JAX
multi-controller recipe:

* every process calls :func:`initialize` (coordinator address + its rank),
* the global ``Mesh`` spans ALL processes' devices (``jax.devices()`` is
  global after init); ICI shards within a host, DCN carries the cross-host
  collectives XLA inserts,
* each process loads only its own slice of every global batch
  (:func:`process_local_indices`) and assembles the global array with
  :func:`global_batch` (``jax.make_array_from_process_local_data``) — no
  host ever materializes the full batch.

Validated by ``tests/test_distributed.py``: a real 2-process CPU cluster
(coordinator on localhost) runs a data-parallel train step and both ranks
see the identical loss.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-process runtime (idempotent, env-fallback).

    Arguments default to ``MVTB_COORDINATOR`` / ``MVTB_NUM_PROCESSES`` /
    ``MVTB_PROCESS_ID`` environment variables; with fewer than 2 processes
    this is a no-op, so single-host entry points can call it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get("MVTB_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("MVTB_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("MVTB_PROCESS_ID", "0"))
    if num_processes < 2 or coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_local_indices(global_batch_size: int,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None
                          ) -> Tuple[int, int]:
    """[start, stop) slice of a global batch this process is responsible
    for. Requires the batch to divide evenly (static shapes under jit)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(f"global batch {global_batch_size} must divide "
                         f"process count {pc}")
    per = global_batch_size // pc
    return pi * per, (pi + 1) * per


def global_batch(mesh: Mesh, local_batch: np.ndarray,
                 axis_name: str = "data") -> jax.Array:
    """Assemble a globally-sharded array from this process's local slice.

    ``local_batch`` is the rows from :func:`process_local_indices`; the
    result behaves as the full global batch sharded over ``axis_name``.
    """
    spec = P(axis_name, *([None] * (np.ndim(local_batch) - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_batch))


def distributed_mesh(n_model: int = 1,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, model) mesh over ALL processes' devices, data-major so each
    host's local devices sit adjacent on the data axis (per-host batch
    slices land on local devices; gradient all-reduce rides ICI first,
    DCN once per host)."""
    devices = list(devices if devices is not None else jax.devices())
    n_data = len(devices) // n_model
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))
