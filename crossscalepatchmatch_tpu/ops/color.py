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


# CIE Lab conversion constants (OpenCV cvtColor CV_BGR2Lab semantics for
# CV_8U inputs, per the imgproc documentation): linear sRGB-primaries
# RGB -> XYZ matrix, D65 white point, the 0.008856 cube-root threshold.
_XYZ_M = ((0.412453, 0.357580, 0.180423),
          (0.212671, 0.715160, 0.072169),
          (0.019334, 0.119193, 0.950227))
_XN, _ZN = 0.950456, 1.088754
_LAB_T = 0.008856


def bgr_to_lab_u8(bgr_u8: jax.Array) -> jax.Array:
    """u8 BGR -> u8 CIE Lab with OpenCV's 8-bit scaling.

    The reference converts each view (and, in CSPC, each pyramid level)
    to Lab at construction (grd_pc.cc:31-35, cspc.cc:48-49) for the
    USE_LAB_WGT adaptive-support-weight variant (grd_pc.h:25, compiled
    off there; a selectable capability here -- config.use_lab_weights).
    OpenCV 8U semantics: inputs scaled to [0, 1] (no gamma), L stored as
    L*255/100, a/b offset by +128, saturate-cast to u8.  OpenCV's own 8U
    path runs table-driven fixed point, so individual values may differ
    by +-1 step; the reference never executes its Lab path, so the
    documented formula is the authority here.
    """
    rgb = bgr_to_rgb(bgr_u8).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    x = (_XYZ_M[0][0] * r + _XYZ_M[0][1] * g + _XYZ_M[0][2] * b) / _XN
    y = _XYZ_M[1][0] * r + _XYZ_M[1][1] * g + _XYZ_M[1][2] * b
    z = (_XYZ_M[2][0] * r + _XYZ_M[2][1] * g + _XYZ_M[2][2] * b) / _ZN

    def f(t):
        return jnp.where(t > _LAB_T, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    el = jnp.where(y > _LAB_T, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (f(x) - f(y)) + 128.0
    bb = 200.0 * (f(y) - f(z)) + 128.0
    lab = jnp.stack([el * jnp.float32(255.0 / 100.0), a, bb], axis=-1)
    return jnp.clip(jnp.rint(lab), 0, 255).astype(jnp.uint8)
