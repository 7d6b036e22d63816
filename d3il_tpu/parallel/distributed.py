"""Multi-host (DCN) initialization and host-local data sharding.

The reference has no distributed backend at all (SURVEY §2.8: no
torch.distributed import anywhere; multi-core eval is OS processes with
shared-memory tensors). The TPU-native scaling story is:

  * within a slice: the "dp" mesh axis over local chips, collectives on ICI
    (parallel/mesh.py);
  * across hosts: `jax.distributed.initialize` brings every host's chips
    into one global device set, the same "dp" mesh spans all of them, and
    XLA routes the gradient psum over DCN between slices;
  * data loading stays host-local: each process loads only its shard of the
    demo pickles / env batch and assembles the global array with
    `jax.make_array_from_process_local_data` — no host ever materializes
    the full batch.

`initialize_from_env` reads the standard coordinator variables so the same
training entry point works single-host (no-op) and under a multi-host
launcher (GKE/xmanager-style env injection), proven by the 2-process CPU
dryrun in tests/test_distributed.py.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env() -> bool:
    """jax.distributed.initialize from D3IL_COORD_ADDR / D3IL_NUM_PROCS /
    D3IL_PROC_ID (no-op single-process when unset). Returns True if a
    multi-process runtime was initialized."""
    addr = os.environ.get("D3IL_COORD_ADDR")
    if not addr:
        return False
    num = int(os.environ["D3IL_NUM_PROCS"])
    pid = int(os.environ["D3IL_PROC_ID"])
    jax.distributed.initialize(coordinator_address=addr, num_processes=num,
                               process_id=pid)
    return True


def global_mesh(axis: str = "dp") -> Mesh:
    """Mesh over ALL global devices (every process's chips)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Assemble a dp-sharded GLOBAL array from each process's LOCAL shard.

    Every leaf's leading axis is this process's slice of the global batch
    (global size = local size x process_count); the returned jax.Arrays are
    addressable only for the local shards, exactly what
    `make_array_from_process_local_data` provides for host-local loading.
    """
    def put(x):
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.tree_util.tree_map(put, tree)


def process_shard(n_items: int) -> slice:
    """The contiguous slice of a global work list owned by this process."""
    pc, pi = jax.process_count(), jax.process_index()
    per = -(-n_items // pc)
    return slice(pi * per, min((pi + 1) * per, n_items))
