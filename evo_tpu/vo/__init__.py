from evo_tpu.vo import align_sim3, ba, frontend, keyframe  # noqa: F401
