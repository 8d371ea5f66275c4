from evo_tpu.core import camera, lie, types  # noqa: F401
