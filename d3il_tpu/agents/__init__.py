from d3il_tpu.agents import base, bc  # noqa: F401
