"""x-gradient with OpenCV Sobel(dx=1, ksize=1) semantics.

The reference computes the x-gradient of the float grayscale image with
Sobel ksize=1 (cc/grd_cc.cpp:74-77), which is the plain central-difference
kernel [-1, 0, 1] (no y smoothing) under BORDER_REFLECT_101.  Reflect-101 of
x=-1 is x=1, so the border columns evaluate to exactly 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sobel_x_k1(gray: jax.Array) -> jax.Array:
    """dst(x) = gray(x+1) - gray(x-1), 0 at the first/last column.

    Args:
      gray: f32[..., H, W].

    Returns:
      f32[..., H, W].
    """
    gray = gray.astype(jnp.float32)
    left = gray[..., :, :-2]
    right = gray[..., :, 2:]
    interior = right - left
    zeros = jnp.zeros_like(gray[..., :, :1])
    return jnp.concatenate([zeros, interior, zeros], axis=-1)
