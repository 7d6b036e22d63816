from d3il_tpu.data import dataset, scaler  # noqa: F401
