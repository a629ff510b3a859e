"""Fused Pallas TPU kernel for the ASW quadrant-volume build.

ops.prescreen_volume.build_quadrant_volumes aggregates, once per pair,
the ASW-weighted cost volume into 2x2 window-quadrant accumulators

    B_Q[c, d] = sum_{q in Q(c)} w(c, q) * vol[q, d]
    W_Q[c]    = sum_{q in Q(c)} w(c, q)

over ~18x18 strided window offsets.  The jnp formulation's fori loop
re-reads and re-writes the [H, W, D] accumulator in HBM on every
offset (~40 GB of HBM round-trips at bench shape -- measured 175 ms,
15% of the production pipeline; more at KITTI depth).  This kernel
keeps a tile's accumulators in VMEM across all offsets, so HBM sees
the volume once in and the four quadrant volumes once out: the same
halo'd-tile layout, row rotate, and static lane slices as the
window-cost kernel (ops.pallas.window_cost), minus the tent -- the
accumulation here is a plain weight-broadcast FMA over the depth axis.

Semantics match build_quadrant_volumes exactly (same neg/pos offset
ranges, quadrant order [(--), (-+), (+-), (++)], border clip);
tests/test_prescreen_volume.py checks element-level agreement and
tests_tpu checks exactness on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_cost import PreparedVolumes, _round_up, prepare_volumes


def _offsets(half_wnd: int, stride: int):
    """The jnp build's offset ranges: quadrant -side / +side
    (prescreen_volume.build_quadrant_volumes: 0 belongs to the +side)."""
    neg = list(range(-half_wnd, 0, stride))
    pos = list(range(0, half_wnd + 1, stride))
    return neg, pos


def _kernel(dytab_ref, yb_ref, img_hbm, vol_hbm, bq_ref, wq_ref,
            *scratch, hb: int, th: int, tw: int, dpad: int, gamma: float,
            n_neg: int, dxs: tuple):
    """One (view, tile_y, tile_x, dy) grid step: accumulate every dx
    offset of window row dy into the tile's quadrant accumulators.

    dytab_ref: i32[n_dy] scalar-prefetch -- the dy offset per grid step
      (neg ++ pos order; the first n_neg entries are the -side).
    yb_ref: i32[4] scalar-prefetch -- [ylo, yhi, xlo, xhi) valid bounds.
    bq_ref: f32[1, 4, th, dpad, tw] VMEM block (quadrant volumes).
    wq_ref: f32[1, 4, th, tw] VMEM block (quadrant weight sums).
    """
    img_tile, vol_tile, img_rot, sems = scratch
    mg = hb
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    dyi = pl.program_id(3)
    r0 = ti * th
    c0 = tj * tw
    rows_t = img_tile.shape[1]
    wt = img_tile.shape[2]

    @pl.when(dyi == 0)
    def _setup():
        cp_img = pltpu.make_async_copy(
            img_hbm.at[v, :, pl.ds(r0, rows_t), pl.ds(c0, wt)],
            img_tile, sems.at[0])
        cp_vol = pltpu.make_async_copy(
            vol_hbm.at[v, pl.ds(r0, rows_t), :, pl.ds(c0, wt)],
            vol_tile, sems.at[1])
        cp_img.start()
        cp_vol.start()
        cp_img.wait()
        cp_vol.wait()
        bq_ref[...] = jnp.zeros(bq_ref.shape, bq_ref.dtype)
        wq_ref[...] = jnp.zeros(wq_ref.shape, wq_ref.dtype)

    dy = dytab_ref[dyi]
    # rows at the traced sublane offset mg + dy (see window_cost._kernel:
    # dynamic memref slices on the tiled rows axis are rejected, the
    # rotate is the workaround); the vol tile's rows axis is UNtiled
    # (leading axis of (rows, dpad, wt)), so it slices directly.
    img_rot[...] = pltpu.roll(img_tile[0:3], rows_t - (mg + dy), 1)
    vol_dy = vol_tile[pl.ds(mg + dy, th), :, :]

    ctr = [img_tile[p, mg:mg + th, mg:mg + tw] for p in range(3)]
    q_rows = [img_rot[p, 0:th, :] for p in range(3)]
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + r0
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + c0
    inv_gamma = jnp.float32(1.0 / gamma)
    y_ok = (ys + dy >= yb_ref[0]) & (ys + dy < yb_ref[1])
    # quadrant row: first n_neg grid steps are the -side (index 0/1),
    # the rest the +side (index 2/3)
    q_row = jnp.where(dyi < n_neg, 0, 2)

    for dxi, dx in enumerate(dxs):
        off = dx + hb
        q = [q_rows[p][:, off:off + tw] for p in range(3)]
        q_ok = y_ok & (xs + dx >= yb_ref[2]) & (xs + dx < yb_ref[3])
        l1 = (jnp.abs(ctr[0] - q[0]) + jnp.abs(ctr[1] - q[1])
              + jnp.abs(ctr[2] - q[2]))
        wgt = jnp.where(q_ok, jnp.exp(-l1 * inv_gamma), 0.0)
        qi = q_row + (0 if dx < 0 else 1)
        vol_q = vol_dy[:, :, off:off + tw]
        bq_ref[0, qi] += wgt[:, None, :] * vol_q
        wq_ref[0, qi] += wgt


def quadrant_volumes_prepared(prep: PreparedVolumes, *, half_wnd: int,
                              gamma: float, stride: int = 2,
                              ybounds: jax.Array | None = None,
                              th: int = 64, tw: int = 128):
    """Fused quadrant-volume build over a window-cost kernel layout.

    Args:
      prep: prepare_volumes output (scale 0; shares the layout with the
        window-cost kernel so one transpose serves both).
      ybounds: optional i32[4] [ylo, yhi, xlo, xhi) valid bounds
        (defaults to the full image -- the jnp build's valid=None).

    Returns:
      (bq: f32[2, 4, H, W, D], wq: f32[2, 4, H, W]) -- identical to
      jax.vmap(build_quadrant_volumes)(imgs, vols).
    """
    assert prep.scale == 0, "quadrant build is a fine-level structure"
    h, w, d = prep.h, prep.w, prep.d
    img_p, vol_p = prep.img_p, prep.vol_p
    nv = img_p.shape[0]
    hb = half_wnd
    mg = hb
    dpad = vol_p.shape[2]
    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * mg, 8)
    wt_pad = _round_up(tw + 2 * mg, 128)

    neg, pos = _offsets(hb, stride)
    dys = neg + pos
    dxs = tuple(neg + pos)
    if ybounds is None:
        ybounds = jnp.array([0, h, 0, w], jnp.int32)

    kern = functools.partial(_kernel, hb=hb, th=th, tw=tw, dpad=dpad,
                             gamma=gamma, n_neg=len(neg), dxs=dxs)
    grid = (nv, n_ty, n_tx, len(dys))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, th, dpad, tw),
                         lambda v, i, j, *_: (v, 0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, th, tw),
                         lambda v, i, j, *_: (v, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, rows_t, wt_pad), jnp.float32),
            pltpu.VMEM((rows_t, dpad, wt_pad), vol_p.dtype),
            pltpu.VMEM((3, rows_t, wt_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_offs = len(dys) * len(dxs)
    bq_pad, wq_pad = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((nv, 4, n_ty * th, dpad, n_tx * tw),
                                 jnp.float32),
            jax.ShapeDtypeStruct((nv, 4, n_ty * th, n_tx * tw),
                                 jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nv * n_ty * th * n_tx * tw * n_offs * (dpad * 2 + 12),
            bytes_accessed=(vol_p.size * vol_p.dtype.itemsize
                            + nv * 4 * h * w * dpad * 4),
            transcendentals=nv * n_ty * th * n_tx * tw * n_offs,
        ),
    )(jnp.asarray(dys, jnp.int32), ybounds.astype(jnp.int32),
      img_p, vol_p)
    # consumer layout (quadrant_prescreen_cost): [2, 4, H, W, D]
    bq = jnp.moveaxis(bq_pad[:, :, :h, :d, :w], 3, -1)
    return bq, wq_pad[:, :, :h, :w]


@functools.partial(jax.jit, static_argnames=("half_wnd", "gamma",
                                             "stride", "th", "tw"))
def quadrant_volumes_pallas(imgs_u8: jax.Array, vols: jax.Array, *,
                            half_wnd: int, gamma: float, stride: int = 2,
                            th: int = 64, tw: int = 128):
    """One-shot convenience wrapper: prepare + build (used by tests)."""
    prep = prepare_volumes(imgs_u8, vols, half_wnd=half_wnd, th=th, tw=tw)
    return quadrant_volumes_prepared(prep, half_wnd=half_wnd, gamma=gamma,
                                     stride=stride, th=th, tw=tw)
