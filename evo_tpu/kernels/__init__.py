from evo_tpu.kernels import gradients, harris, interp, lk, splat, warp  # noqa: F401
