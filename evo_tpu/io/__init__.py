from evo_tpu.io import davis, replay  # noqa: F401
