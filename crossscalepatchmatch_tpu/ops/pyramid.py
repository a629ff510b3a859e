"""Gaussian pyramid with OpenCV pyrDown semantics.

The cross-scale path builds a scale_num-level pyramid with pyrDown
(pre_cs_pc.cc:42-49): 5x5 Gaussian kernel (1,4,6,4,1)/16 (separable, /256
total), BORDER_REFLECT_101, then decimation keeping even rows/columns, with
output size ceil(n/2) = (n+1)//2.

The blur is expressed as two 1-D convolutions so XLA maps it onto cheap
shifted adds; uint8 inputs are filtered in f32 and rounded back.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _reflect101_pad(x: jax.Array, axis: int, pad: int) -> jax.Array:
    """BORDER_REFLECT_101 padding: gfedcb|abcdefgh|gfedcba."""
    n = x.shape[axis]
    idx = jnp.arange(-pad, n + pad)
    idx = jnp.abs(idx)                      # reflect at 0 without repeating edge
    idx = jnp.where(idx >= n, 2 * (n - 1) - idx, idx)
    return jnp.take(x, idx, axis=axis)


def _blur1d(x: jax.Array, axis: int) -> jax.Array:
    xp = _reflect101_pad(x, axis, 2)
    out = jnp.zeros_like(x, dtype=jnp.float32)
    n = x.shape[axis]
    for i, k in enumerate(_K5):
        out = out + k * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
    return out


def pyr_down(img: jax.Array) -> jax.Array:
    """One pyrDown step: 5x5 Gaussian blur + even-index decimation.

    Args:
      img: [H, W] or [H, W, C], any dtype (uint8 is blurred in f32 and
        rounded back).

    Returns:
      [(H+1)//2, (W+1)//2, ...] image of the input dtype.
    """
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    x = _blur1d(x, axis=0)
    x = _blur1d(x, axis=1)
    x = x[::2, ::2]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        x = jnp.clip(jnp.rint(x), info.min, info.max)
    return x.astype(orig_dtype)


def build_pyramid(img: jax.Array, levels: int) -> List[jax.Array]:
    """Full pyramid [level 0 = input, level s = pyr_down^s(input)]."""
    out = [img]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out
