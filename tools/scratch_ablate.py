"""Scratch: ablate the window-cost kernel's per-dx pieces.

A trimmed standalone kernel mirroring ops/pallas/window_cost structure:
grid (2, ty, tx, dy), tile DMA at dy==0, per-dy sublane roll, fori over
dx with {img rolls + ASW weight, vol roll, K x tent contraction,
accumulate}.  Flags knock out pieces to attribute the measured
fixed/marginal launch cost.  Not semantics-exact (slab anchored at 0).
"""
import functools
import os
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, D = 375, 450, 64
TH, TW = 64, 128
HB = 17
MG = HB


def _round_up(x, m):
    return (x + m - 1) // m * m


def kernel(img_hbm, vol_hbm, abc_ref, out_ref, img_tile, vol_tile, sems,
           *, k, slab, do_wgt, do_vroll, do_tent, do_iroll, n_dx):
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    r0 = ti * TH
    c0 = tj * TW
    rows_t = img_tile.shape[1]
    wt = img_tile.shape[2]

    @pl.when(pl.program_id(3) == 0)
    def _():
        cp = pltpu.make_async_copy(
            img_hbm.at[v, :, pl.ds(r0, rows_t), pl.ds(c0, wt)],
            img_tile, sems.at[0])
        cp2 = pltpu.make_async_copy(
            vol_hbm.at[v, pl.ds(r0, rows_t), :, pl.ds(c0, wt)],
            vol_tile, sems.at[1])
        cp.start(); cp2.start(); cp.wait(); cp2.wait()
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    dy = pl.program_id(3) - HB
    sy = dy
    ctr = [img_tile[p, MG:MG + TH, MG:MG + TW] for p in range(3)]
    params = [[abc_ref[0, kk, c] for c in range(3)] for kk in range(k)]

    rows = img_tile.shape[1]
    img_r = pltpu.roll(img_tile[0:3], rows - (MG + sy), 1)
    img_dy = [img_r[p, 0:TH, :] for p in range(3)]
    vol_dy = vol_tile[pl.ds(MG + sy, TH), 0:slab, :]
    d_io = jax.lax.broadcasted_iota(jnp.int32, (TH, slab, TW),
                                    1).astype(jnp.float32)

    def dx_body(dxi, _):
        dx = dxi - HB
        shift = wt - (dx + HB)
        if do_iroll:
            q = [pltpu.roll(img_dy[p], shift, 1)[:, :TW] for p in range(3)]
        else:
            q = [img_dy[p][:, :TW] for p in range(3)]
        if do_vroll:
            vol_q = pltpu.roll(vol_dy, shift, 2)[:, :, :TW]
        else:
            vol_q = vol_dy[:, :, :TW]
        if do_wgt:
            l1 = (jnp.abs(ctr[0] - q[0]) + jnp.abs(ctr[1] - q[1])
                  + jnp.abs(ctr[2] - q[2]))
            wgt = jnp.exp(-l1 * 0.1)
        else:
            wgt = ctr[0]
        dxf = dx.astype(jnp.float32)
        for kk in range(k):
            dq = params[kk][0] + params[kk][1] * dxf + params[kk][2] * dy
            if do_tent:
                tent = jnp.maximum(0.0, 1.0 - jnp.abs(dq[:, None, :] - d_io))
                val = jnp.sum(vol_q * tent, axis=1)
            else:
                val = vol_q[:, 0, :] + dq
            out_ref[0, kk] += wgt * val
        return 0

    jax.lax.fori_loop(0, n_dx, dx_body, 0)


def build(k, slab, do_wgt=True, do_vroll=True, do_tent=True, do_iroll=True,
          n_dx=35, n_dy=35):
    n_ty = -(-H // TH)
    n_tx = -(-W // TW)
    rows_t = _round_up(TH + 2 * MG, 8)
    wt = _round_up(TW + 2 * MG, 128)
    hp = (n_ty - 1) * TH + rows_t
    wp = (n_tx - 1) * TW + wt
    kern = functools.partial(kernel, k=k, slab=slab, do_wgt=do_wgt,
                             do_vroll=do_vroll, do_tent=do_tent,
                             do_iroll=do_iroll, n_dx=n_dx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(2, n_ty, n_tx, n_dy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, 3, TH, TW), lambda v, i, j, *_: (v, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, TH, TW),
                               lambda v, i, j, *_: (v, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, rows_t, wt), jnp.float32),
            pltpu.VMEM((rows_t, D, wt), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    f = pl.pallas_call(
        kern, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((2, k, n_ty * TH, n_tx * TW),
                                       jnp.float32))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 3, hp, wp), np.float32))
    vol = jnp.asarray(rng.random((2, hp, D, wp), np.float32))
    abc = jnp.asarray(rng.random((2, k, 3, n_ty * TH, n_tx * TW),
                                 np.float32))
    return f, (img, vol, abc)


def timed(f, args, reps=4):
    out = f(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(jnp.sum(f(*args)))
    return (time.perf_counter() - t0) / reps


cases = [
    # label, kwargs
    ("full k1 slab8", dict(k=1, slab=8)),
    ("full k8 slab8", dict(k=8, slab=8)),
    ("full k1 slab32", dict(k=1, slab=32)),
    ("full k8 slab32", dict(k=8, slab=32)),
    ("no-tent k8 slab8", dict(k=8, slab=8, do_tent=False)),
    ("no-vroll k8 slab8", dict(k=8, slab=8, do_vroll=False)),
    ("no-wgt k8 slab8", dict(k=8, slab=8, do_wgt=False)),
    ("no-iroll k8 slab8", dict(k=8, slab=8, do_iroll=False)),
    ("no-tent k1 slab8", dict(k=1, slab=8, do_tent=False)),
    ("no-vroll k1 slab8", dict(k=1, slab=8, do_vroll=False)),
    ("bare k1 (no t/v/w/i)", dict(k=1, slab=8, do_tent=False,
                                  do_vroll=False, do_wgt=False,
                                  do_iroll=False)),
    ("ndx1 k1 slab8", dict(k=1, slab=8, n_dx=1)),
    ("ndy1 k1 slab8", dict(k=1, slab=8, n_dy=1)),
]
for label, kw in cases:
    f, args = build(**kw)
    print(f"{label:<24} {timed(f, args)*1e3:7.1f} ms", flush=True)
