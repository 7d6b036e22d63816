from d3il_tpu.robot import chain, panda  # noqa: F401
