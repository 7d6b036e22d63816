"""Device mesh + sharding helpers.

The framework's scaling axis is the env/data batch: env states and minibatches
shard over all devices ("dp"), parameters replicate, and XLA inserts the
collectives (psum for gradient reduction) — replacing the reference's
process-per-env eval workers and single-process DataParallel training
(SURVEY.md §2.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
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


def constrain_batch(tree, mesh: Mesh | None, axis: str = "dp"):
    """with_sharding_constraint the leading axis of every leaf onto `axis`
    (no-op when mesh is None). Used inside jitted train steps to force the
    minibatch to stay dp-sharded so XLA partitions the loss/grad computation
    and inserts the gradient psum."""
    if mesh is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        tree)


def run_sharded(fn, *batched_inputs, mesh: Mesh | None = None):
    """jit(vmap(fn)) over the leading axis, sharded across all devices.

    The TPU analogue of the reference's process-per-core eval fan-out
    (simulation/pushing_sim.py:105-138): episodes are lanes of one vmapped
    computation whose batch axis is dp-sharded over the mesh; XLA partitions
    the whole rollout (physics + controller + policy) per device. Inputs are
    padded up to a multiple of the device count (by repeating lane 0) and
    outputs sliced back, so any (contexts x trajectories) grid works.

    Falls back to plain jit(vmap(fn)) on a single device.
    """
    sizes = {jax.tree_util.tree_leaves(x)[0].shape[0] for x in batched_inputs}
    assert len(sizes) == 1, f"mismatched leading axes {sizes}"
    B = sizes.pop()
    if mesh is None:
        devices = jax.devices()
        if len(devices) == 1:
            return jax.jit(jax.vmap(fn))(*batched_inputs)
        mesh = data_mesh(devices)
    n = mesh.devices.size
    Bp = -(-B // n) * n

    def pad(x):
        if Bp == B:
            return x
        reps = jnp.broadcast_to(x[:1], (Bp - B,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    padded = jax.tree_util.tree_map(pad, batched_inputs)
    padded = shard_batch(mesh, padded)
    out = jax.jit(jax.vmap(fn))(*padded)
    return jax.tree_util.tree_map(lambda x: x[:B], out)
