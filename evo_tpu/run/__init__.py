from evo_tpu.run import artifacts, evaluator  # noqa: F401
