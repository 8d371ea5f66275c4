from evo_tpu.dist import halo, mesh, reduce, tiling  # noqa: F401
