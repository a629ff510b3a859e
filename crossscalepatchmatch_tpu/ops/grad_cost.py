"""Truncated absolute-difference color + gradient (GRD) cost volume.

Reference semantics (cc/grd_cc.cpp):
  * per-pixel cost between left pixel x and right pixel x-d:
      clr = mean_c |lC(x) - rC(x-d)|, truncated at tau_clr (grd_cc.cpp:7-16);
      grd = |lGx(x) - rGx(x-d)|, truncated at tau_grd;
      cost = alpha*clr + (1-alpha)*grd  with alpha = 0.1 (grd_cc.h:6-9);
  * the x-gradient is Sobel ksize=1 of the float BT.601 grayscale
    (grd_cc.cpp:70-77), see ops.gradient.sobel_x_k1;
  * border columns (x-d out of range) compare the in-range pixel against the
    constant pseudo-intensity BORDER_THRES=3 instead (grd_cc.cpp:21-35);
  * the right-referenced volume mirrors with x+d (grd_cc.cpp:110-154).

Images are 0..255-valued float RGB (the reference feeds CV_64F; f32 here --
all quantities are <= 765 with single abs-differences, far inside f32's exact
integer range, so the truncations behave identically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .color import rgb_to_gray_f32
from .gradient import sobel_x_k1


def grd_cost_volume(l_rgb: jax.Array, r_rgb: jax.Array, max_dis: int,
                    alpha: float = 0.1, tau_clr: float = 10.0,
                    tau_grd: float = 2.0, border_thres: float = 3.0,
                    right: bool = False) -> jax.Array:
    """TAD color+gradient cost volume with d in [0, max_dis] inclusive.

    Args:
      l_rgb / r_rgb: f32[H, W, 3] RGB views with 0..255 values.
      max_dis: maximum disparity; the volume has max_dis+1 slices.
      right: build the right-referenced volume.

    Returns:
      f32[H, W, max_dis+1].
    """
    l_rgb = l_rgb.astype(jnp.float32)
    r_rgb = r_rgb.astype(jnp.float32)
    l_grd = sobel_x_k1(rgb_to_gray_f32(l_rgb))
    r_grd = sobel_x_k1(rgb_to_gray_f32(r_rgb))

    def mix(clr, grd):
        clr = jnp.minimum(clr, tau_clr)
        grd = jnp.minimum(grd, tau_grd)
        return alpha * clr + (1.0 - alpha) * grd

    if right:
        ref_rgb, ref_grd, oth_rgb, oth_grd = r_rgb, r_grd, l_rgb, l_grd
    else:
        ref_rgb, ref_grd, oth_rgb, oth_grd = l_rgb, l_grd, r_rgb, r_grd

    h, w = ref_grd.shape
    x = jnp.arange(w)[None, :]
    border_clr = jnp.mean(jnp.abs(ref_rgb - border_thres), axis=-1)
    border_cost = mix(border_clr, jnp.abs(ref_grd - border_thres))

    slices = []
    for d in range(max_dis + 1):
        shift = -d if right else d
        oth_rgb_d = jnp.roll(oth_rgb, shift, axis=1)
        oth_grd_d = jnp.roll(oth_grd, shift, axis=1)
        clr = jnp.mean(jnp.abs(ref_rgb - oth_rgb_d), axis=-1)
        cost = mix(clr, jnp.abs(ref_grd - oth_grd_d))
        in_range = (x + d < w) if right else (x - d >= 0)
        slices.append(jnp.where(in_range, cost, border_cost))
    return jnp.stack(slices, axis=-1)
