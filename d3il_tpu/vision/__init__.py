from d3il_tpu.vision import renderer, encoder  # noqa: F401
