"""d3il_tpu: a TPU-native imitation-learning benchmark framework.

Re-implements the capabilities of the D3IL benchmark (7 MuJoCo Franka-Panda
manipulation tasks, demonstration datasets, 11 imitation-learning agents, and
a success/entropy/KL evaluation harness) as a single vectorized JAX stack:
batched articulated-body physics + controllers as jit/vmap-compiled pure
functions, Flax agents, and on-device batched evaluation sharded over TPU
meshes.

Nothing here is a port: the architecture is functional and array-oriented
(stacked env states under vmap, lax.scan substeps, sharded rollout batches)
rather than the reference's object graph + OS-process parallelism.
"""

__version__ = "0.1.0"
