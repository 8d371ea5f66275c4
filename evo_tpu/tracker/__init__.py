from evo_tpu.tracker import align, compensate, detector, patch_state  # noqa: F401
