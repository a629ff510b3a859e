"""Fused Pallas TPU kernel for the slanted-plane ASW window cost.

This is the engine's hot path (SURVEY.md section 3.5): ~75 plane-cost
evaluations per pixel per pair, each a 35x35 adaptive-support-weight window
sum over a disparity volume with per-window-pixel linear interpolation
between slices (pre_ss_pc.cc:74-118).

Why a kernel: the jnp formulation pays a per-pixel gather
(take_along_axis along the disparity axis) per window offset, which XLA:TPU
serializes (~4 ms per offset at cones size, ~5 s per evaluation).  TPUs
have no per-lane dynamic gather usable here (Mosaic's dynamic_gather needs
full-shape lane indices), so the kernel removes the gather entirely: the
two-tap lerp at fractional disparity dq equals the dense contraction

    val(q) = sum_d vol[q, d] * max(0, 1 - |dq - d|)

which is pure VPU work.  Layout choices that make it fast:
  * the volume is stored [H, D, W]: D rides the sublane axis (padded to a
    multiple of 8), W rides the 128-wide lane axis at full utilization;
  * the image is stored [3, H, W] planes so the ASW weight's channel sum
    is three 2-D slices, not a minor-axis reduction;
  * adaptive weights w(c, q) = exp(-L1(img_c, img_q)/gamma) depend only on
    the image, so they are computed once per window offset and reused
    across all K candidate planes (the stencil of a propagation sweep);
  * halo'd tiles (half_wnd on every side) are DMA'd from HBM manually --
    overlapping tiles are not expressible with BlockSpec index maps -- and
    compute dwarfs the copy by ~3 orders of magnitude.

Semantics match ops.plane_cost.window_plane_cost exactly (same masking,
C-trunc, in-range test f in [1, max_dis-1], and out-of-range saturation to
max(volume)); tests/test_pallas.py checks element-level agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(maxc_ref, img_hbm, vol_hbm, abc_ref, out_ref,
            img_tile, vol_tile, sems,
            *, hb: int, wnd: int, th: int, tw: int, dpad: int,
            max_dis: int, gamma: float, h: int, w: int, k: int):
    """One (view, tile_y, tile_x) grid step.

    img_hbm: f32[2, 3, Hp, Wp] HBM   (padded by hb on every side of H, W)
    vol_hbm: f32[2, Hp, dpad, Wp] HBM
    abc_ref: f32[1, K, 4, th, tw] VMEM block -- (d_center, a, b, pad)
    maxc_ref: f32[2] SMEM scalar-prefetch -- per-view saturation values
    out_ref: f32[1, K, th, tw] VMEM block
    img_tile: f32[3, th+2hb, WT] VMEM scratch, WT = roundup(tw+2hb, 128)
      (dynamic lane-rotates need a 128-multiple lane dim; lanes past
      tw+2hb are never read)
    vol_tile: f32[th+2hb, dpad, WT] VMEM scratch
    """
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    r0 = ti * th          # padded-array row of the tile's first halo row
    c0 = tj * tw

    rows_t = img_tile.shape[1]       # roundup(th + 2hb, 8)
    wt = img_tile.shape[2]           # roundup(tw + 2hb, 128)
    # DMA slab sizes are rounded up to the (8, 128) memref tiling; the
    # extra rows/lanes are never read by the compute below.
    cp_img = pltpu.make_async_copy(
        img_hbm.at[v, :, pl.ds(r0, rows_t), pl.ds(c0, wt)],
        img_tile, sems.at[0])
    cp_vol = pltpu.make_async_copy(
        vol_hbm.at[v, pl.ds(r0, rows_t), :, pl.ds(c0, wt)],
        vol_tile, sems.at[1])
    cp_img.start()
    cp_vol.start()

    # Global (unpadded) coordinates of the tile's center pixels.
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + r0
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + c0
    maxc = maxc_ref[v]
    inv_gamma = jnp.float32(1.0 / gamma)
    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, (th, dpad, tw), 1).astype(jnp.float32)

    cp_img.wait()
    ctr = [img_tile[p, hb:hb + th, hb:hb + tw] for p in range(3)]
    cp_vol.wait()

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    params = [[abc_ref[0, kk, c] for c in range(3)] for kk in range(k)]

    # Mosaic cannot form vector loads at traced sublane/lane offsets, so
    # the row offset dy is a static unroll (unaligned static slices are
    # fine) and the column offset dx becomes a dynamic lane-rotate of the
    # per-dy row slab (tpu dynamic_rotate) followed by a static slice.
    for dy in range(-hb, hb + 1):
        img_dy = [img_tile[p, hb + dy:hb + dy + th, :] for p in range(3)]
        vol_dy = vol_tile[hb + dy:hb + dy + th, :, :]
        y_ok = (ys + dy >= 0) & (ys + dy < h)

        def dx_body(dxi, _, img_dy=img_dy, vol_dy=vol_dy, y_ok=y_ok,
                    dy=dy):
            shift = wt - dxi
            q = [pltpu.roll(img_dy[p], shift, 1)[:, :tw] for p in range(3)]
            vol_q = pltpu.roll(vol_dy, shift, 2)[:, :, :tw]
            dx = dxi - hb
            l1 = (jnp.abs(ctr[0] - q[0]) + jnp.abs(ctr[1] - q[1])
                  + jnp.abs(ctr[2] - q[2]))
            # window pixel must lie inside the real image
            q_ok = y_ok & (xs + dx >= 0) & (xs + dx < w)
            wgt = jnp.where(q_ok, jnp.exp(-l1 * inv_gamma), 0.0)
            dxf = dx.astype(jnp.float32)

            for kk in range(k):
                dq = params[kk][0] + params[kk][1] * dxf + params[kk][2] * dy
                f = jnp.trunc(dq)
                in_range = (f >= 1.0) & (f <= jnp.float32(max_dis - 1))
                tent = jnp.maximum(
                    0.0, 1.0 - jnp.abs(dq[:, None, :] - d_iota))
                val = jnp.sum(vol_q * tent, axis=1)
                val = jnp.where(in_range, val, maxc)
                out_ref[0, kk] += wgt * val
            return 0

        jax.lax.fori_loop(0, wnd, dx_body, 0)


class PreparedVolumes:
    """Kernel-layout views of the per-view image + volume data.

    Built ONCE per stereo pair (the transpose/pad of the 2 x H x W x D
    volume is ~100 MB of HBM traffic -- it must not be repaid on each of
    the ~79 cost evaluations of a PatchMatch run).
    """

    def __init__(self, img_p, vol_p, h, w, d):
        self.img_p = img_p    # f32[2, 3, Hp, Wp]
        self.vol_p = vol_p    # f32[2, Hp, dpad, Wp]
        self.h, self.w, self.d = h, w, d


jax.tree_util.register_pytree_node(
    PreparedVolumes,
    lambda p: ((p.img_p, p.vol_p), (p.h, p.w, p.d)),
    lambda aux, ch: PreparedVolumes(*ch, *aux))


def prepare_volumes(imgs_u8: jax.Array, vols: jax.Array, *, half_wnd: int,
                    th: int = 64, tw: int = 128) -> PreparedVolumes:
    """Lay out images/volumes for the kernel (pad + D-to-sublane transpose).

    Args:
      imgs_u8: u8[2, H, W, 3] per-view reference images.
      vols: f32[2, H, W, D] per-view cost volumes.
    """
    nv, h, w, _ = imgs_u8.shape
    d = vols.shape[-1]
    hb = half_wnd
    dpad = _round_up(d, 8)
    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * hb, 8)
    wt_pad = _round_up(tw + 2 * hb, 128)
    hp = (n_ty - 1) * th + rows_t
    wp = (n_tx - 1) * tw + wt_pad

    # [2, 3, Hp, Wp] image planes, zero-padded hb each side (+ tile round-up)
    img_f = jnp.moveaxis(imgs_u8.astype(jnp.float32), -1, 1)
    img_p = jnp.pad(img_f, ((0, 0), (0, 0), (hb, hp - h - hb),
                            (hb, wp - w - hb)))
    # [2, Hp, dpad, Wp] volume, D on the sublane axis
    vol_t = jnp.moveaxis(vols, -1, 2)
    vol_p = jnp.pad(vol_t, ((0, 0), (hb, hp - h - hb), (0, dpad - d),
                            (hb, wp - w - hb)))
    return PreparedVolumes(img_p, vol_p, h, w, d)


def window_plane_cost_prepared(prep: PreparedVolumes, max_costs: jax.Array,
                               abc: jax.Array, *, half_wnd: int,
                               max_dis: int, gamma: float, th: int = 64,
                               tw: int = 128) -> jax.Array:
    """Fused window plane cost over pre-laid-out volumes.

    Args:
      prep: prepare_volumes output (same half_wnd/th/tw).
      max_costs: f32[2] per-view saturation values.
      abc: f32[2, K, H, W, 3] candidate plane fields.

    Returns:
      f32[2, K, H, W] aggregated window costs (identical semantics to
      ops.plane_cost.window_plane_cost vmapped over views).
    """
    h, w, d = prep.h, prep.w, prep.d
    img_p, vol_p = prep.img_p, prep.vol_p
    nv = img_p.shape[0]
    k = abc.shape[1]
    hb = half_wnd
    wnd = 2 * hb + 1
    dpad = _round_up(d, 8)

    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * hb, 8)
    wt_pad = _round_up(tw + 2 * hb, 128)

    # plane params evaluated at global center coords: (d_center, a, b, 0)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_center = abc[..., 0] * xs + abc[..., 1] * ys + abc[..., 2]
    params = jnp.stack([d_center, abc[..., 0], abc[..., 1],
                        jnp.zeros_like(d_center)], axis=2)  # [2, K, 4, H, W]
    params = jnp.pad(params, ((0, 0), (0, 0), (0, 0),
                              (0, n_ty * th - h), (0, n_tx * tw - w)))

    maxc = max_costs.astype(jnp.float32)

    kern = functools.partial(
        _kernel, hb=hb, wnd=wnd, th=th, tw=tw, dpad=dpad,
        max_dis=max_dis, gamma=gamma, h=h, w=w, k=k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, 4, th, tw),
                         lambda v, i, j, *_: (v, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, th, tw),
                               lambda v, i, j, *_: (v, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows_t, wt_pad), jnp.float32),
            pltpu.VMEM((rows_t, dpad, wt_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((nv, k, n_ty * th, n_tx * tw),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nv * k * n_ty * th * n_tx * tw * wnd * wnd * (dpad * 3 + 12),
            bytes_accessed=(vol_p.size + img_p.size) * 4,
            transcendentals=nv * n_ty * th * n_tx * tw * wnd * wnd,
        ),
    )(maxc, img_p, vol_p, params)
    return out[:, :, :h, :w]


@functools.partial(jax.jit, static_argnames=(
    "half_wnd", "max_dis", "gamma", "th", "tw"))
def window_plane_cost_pallas(imgs_u8: jax.Array, vols: jax.Array,
                             max_costs: jax.Array, abc: jax.Array, *,
                             half_wnd: int, max_dis: int, gamma: float,
                             th: int = 64, tw: int = 128) -> jax.Array:
    """One-shot convenience wrapper: prepare + evaluate (used by tests)."""
    prep = prepare_volumes(imgs_u8, vols, half_wnd=half_wnd, th=th, tw=tw)
    return window_plane_cost_prepared(prep, max_costs, abc,
                                      half_wnd=half_wnd, max_dis=max_dis,
                                      gamma=gamma, th=th, tw=tw)
