from evo_tpu.run import artifacts, checkpoint, evaluator, metrics, viz  # noqa: F401
