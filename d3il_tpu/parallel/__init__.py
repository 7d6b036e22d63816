from d3il_tpu.parallel import mesh  # noqa: F401
