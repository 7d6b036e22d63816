from d3il_tpu.agents.nets import mlp  # noqa: F401
