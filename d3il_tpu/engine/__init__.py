from d3il_tpu.engine import model, collision, solver, step  # noqa: F401
