"""Device mesh + sharding helpers.

The framework's scaling axis is the env/data batch: env states and minibatches
shard over all devices ("dp"), parameters replicate, and XLA inserts the
collectives (psum for gradient reduction) — replacing the reference's
process-per-env eval workers and single-process DataParallel training
(SURVEY.md §2.8).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard the leading axis of every leaf over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh, axis: str = "dp"):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
