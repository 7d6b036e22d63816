from d3il_tpu.ops import quat, spline  # noqa: F401
