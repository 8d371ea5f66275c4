"""Camera model tests — project∘unproject round trip on a grid of 3D points
with real DAVIS intrinsics, the property checked by the reference's
`common/test/camera_model_test.cpp:5-34`."""

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.core import camera
from evo_tpu.core.types import CalibParams

# Real DAVIS240C shapes_6dof intrinsics (ECD calib.txt values).
CALIB = CalibParams(
    fx=199.092366542, fy=198.82882047, cx=132.192071378, cy=110.712660011,
    k1=-0.368436311798, k2=0.150947243557, p1=-0.000296130534385,
    p2=-0.000759431726241, k3=0.0,
)


def test_project_unproject_roundtrip():
    params = CALIB.to_array()
    # grid of 3D points in front of the camera, as in camera_model_test.cpp
    xs = np.linspace(-0.9, 0.9, 19)
    ys = np.linspace(-0.9, 0.9, 19)
    gx, gy = np.meshgrid(xs, ys)
    p3d = jnp.asarray(
        np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.0)], axis=-1),
        jnp.float32,
    )
    pix = camera.project(params, p3d)
    bearing = camera.unproject(params, pix)
    # bearing should be parallel to the original ray
    ray = p3d / jnp.linalg.norm(p3d, axis=-1, keepdims=True)
    cos = jnp.sum(bearing * ray, axis=-1)
    np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-4)


def test_unproject_project_roundtrip_in_sensor():
    params = CALIB.to_array()
    xs = np.linspace(20, 219, 15)
    ys = np.linspace(20, 159, 15)
    gx, gy = np.meshgrid(xs, ys)
    pix = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=-1), jnp.float32)
    bearing = camera.unproject(params, pix)
    pix2 = camera.project(params, bearing)  # any positive scale projects the same
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=0.05)


def test_project_is_differentiable():
    params = CALIB.to_array()
    f = lambda p: jnp.sum(camera.project(params, p))
    g = jax.grad(f)(jnp.array([0.1, -0.2, 2.0], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_grad_through_unproject():
    params = CALIB.to_array()
    f = lambda pix: jnp.sum(camera.unproject(params, pix))
    g = jax.grad(f)(jnp.array([100.0, 80.0], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_in_bounds():
    mask = camera.in_bounds(
        (240, 180), jnp.array([[0.0, 0.0], [239.0, 179.0], [240.0, 0.0], [-1.0, 5.0]])
    )
    np.testing.assert_array_equal(np.asarray(mask), [True, True, False, False])
