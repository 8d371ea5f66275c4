from evo_tpu.dist import halo, mesh, multihost, reduce, tiling  # noqa: F401
