from evo_tpu.solve import epipolar, lm, p3p, ransac, triangulate  # noqa: F401
