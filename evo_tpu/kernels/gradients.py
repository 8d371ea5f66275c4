"""Image gradients, log-intensity, separable Gaussian blur.

Replaces the reference's OpenCV calls in the detection path:
- `getLogImage`: log(I/255 + 0.1) over the uint8 frame
  (`feature_detector.cpp:714-723`); our frames are already float in [0, 1]
  so the equivalent is log(I + 0.1).
- `getGradients`: `cv::Sobel(I/8, ...)` x/y derivatives
  (`feature_detector.cpp:725-732`).

Implemented as small depthwise convolutions via `lax.conv_general_dilated`
(XLA maps these onto the MXU/VPU and fuses surrounding elementwise work).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def log_image(img, offset: float = 0.1):
    """Log-intensity image of a [0, 1] float frame (feature_detector.cpp:714-723)."""
    return jnp.log(img + offset)


def _conv2same(img, kernel):
    """'same' 2D correlation of img [H, W] with kernel [kh, kw]."""
    x = img[None, None, :, :]
    k = kernel[None, None, :, :].astype(img.dtype)
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


# numpy (not jnp) so importing the package never initializes the XLA
# backend — jax.distributed.initialize must run first in multi-process
# launches (dist/multihost.py); _conv2same casts to the image dtype anyway
SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
SOBEL_Y = SOBEL_X.T


def sobel(img, scale: float = 1.0):
    """(dx, dy) Sobel gradients. The reference divides the image by 8 before
    Sobel (feature_detector.cpp:725-732), i.e. scale = 1/8 gives parity."""
    gx = _conv2same(img, SOBEL_X) * scale
    gy = _conv2same(img, SOBEL_Y) * scale
    return gx, gy


def central_gradients(img):
    """Central-difference gradients (the contrast functor's finite differences,
    `contrast_functor.h:167-187`)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    # zero the wrap-around borders
    gx = gx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    gy = gy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return gx, gy


def gaussian_kernel1d(sigma: float, radius: int, dtype=jnp.float32):
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, sigma: float, radius: int | None = None):
    """Separable Gaussian blur (used by the structure tensor, σ=1.5 k=3,
    `contrast_functor.h:209-232`)."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    k = gaussian_kernel1d(sigma, radius, img.dtype)
    img = _conv2same(img, k[None, :])
    img = _conv2same(img, k[:, None])
    return img


def image_pyramid(img, num_levels: int):
    """Gaussian pyramid via blur + 2x decimation (for pyramidal LK,
    `flow_estimator.h:13` maxPyramidLevel=3). Level 0 is the input."""
    levels = [img]
    cur = img
    for _ in range(num_levels - 1):
        blurred = gaussian_blur(cur, sigma=1.0, radius=2)
        cur = blurred[::2, ::2]
        levels.append(cur)
    return levels
