from evo_tpu.tracker import (  # noqa: F401
    align,
    compensate,
    detector,
    motion_field,
    patch_state,
)
