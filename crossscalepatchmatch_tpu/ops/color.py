"""Color conversions with the exact semantics the reference relies on.

The reference mixes two grayscale paths:
  * float gray (BT.601 weights) of the 0..255-valued f64 RGB image, used for
    the Sobel gradient in the GRD cost (cc/grd_cc.cpp:70-77);
  * uint8 fixed-point gray (OpenCV CV_RGB2GRAY on CV_8U), used for the census
    transform (cc/cen_cc.cc:12-17).
OpenCV's 8-bit path uses 14-bit fixed-point BT.601 coefficients; we reproduce
it bit-exactly so census bit patterns match a CPU oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# BT.601 luma weights (OpenCV RGB2GRAY).
_R, _G, _B = 0.299, 0.587, 0.114
# OpenCV's fixed-point representation: round(w * 2^14).
_R14, _G14, _B14 = 4899, 9617, 1868


def rgb_to_gray_f32(rgb: jax.Array) -> jax.Array:
    """Float grayscale of an RGB image with 0..255-scaled values."""
    rgb = rgb.astype(jnp.float32)
    return _R * rgb[..., 0] + _G * rgb[..., 1] + _B * rgb[..., 2]


def rgb_to_gray_u8(rgb_u8: jax.Array) -> jax.Array:
    """uint8 grayscale, bit-exact with OpenCV's CV_8U RGB2GRAY.

    gray = (R*4899 + G*9617 + B*1868 + 2^13) >> 14 on integers.
    """
    r = rgb_u8[..., 0].astype(jnp.int32)
    g = rgb_u8[..., 1].astype(jnp.int32)
    b = rgb_u8[..., 2].astype(jnp.int32)
    return ((r * _R14 + g * _G14 + b * _B14 + (1 << 13)) >> 14).astype(jnp.uint8)


def bgr_to_rgb(img: jax.Array) -> jax.Array:
    """Channel swap (main.cc loads BGR; cost volumes are built on RGB,
    pre_ss_pc.cc:33-34).  Kept explicit so channel conventions are auditable;
    note every per-pixel *sum* of channel differences is order-invariant."""
    return img[..., ::-1]
