from d3il_tpu.eval import metrics, rollout  # noqa: F401
