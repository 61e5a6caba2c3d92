"""Multi-host (multi-process) runtime.

The reference is strictly single-process (SURVEY.md §2.6). Here
multi-host scale-out is the standard JAX recipe:

  * jax.distributed.initialize connects the processes (coordinator +
    process_id); after it, jax.devices() is GLOBAL and the
    ('data','model') mesh in parallel/mesh.py spans all hosts — XLA
    routes collectives over ICI within a slice and DCN across slices,
    no transport code here.
  * each process loads only its own examples (DenseCapLoader shards the
    split round-robin by process) and contributes them to global device
    arrays via jax.make_array_from_process_local_data — per-host input
    pipelines, single jitted step.

Single-process runs take the exact same code path (initialize is a
no-op, make_array_from_process_local_data accepts the full batch), so
the train loop has ONE shape.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Connect this process to the job. Returns True if distributed
    mode was initialized, False for single-process runs.

    With no arguments, auto-detection from the environment is attempted
    (cluster env vars / TPU metadata) only when JAX_COORDINATOR_ADDRESS
    is set, so plain single-host runs never stall waiting on a
    coordinator.
    """
    import os

    if num_processes is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return False
    if num_processes is not None and int(num_processes) <= 1:
        return False
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_batch_from_local(local_batch, mesh):
    """Per-process host arrays -> global jax.Arrays sharded over 'data'.

    Every process passes its LOCAL slice of the batch (same shapes on
    all processes); the returned arrays have global shape
    (num_processes * local_B, ...). Works unchanged in single-process
    mode (the local slice IS the batch).
    """
    sharding = NamedSharding(mesh, P("data"))

    def to_global(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(to_global, local_batch)
