"""Sweep (band_rows, slab) on single K=1 exact evals, converged vs random.

Times window_plane_cost_prepared at bench geometry (375x450, d=60,
wnd=35) over a CONVERGED plane field (the slab fast path's target) and a
RANDOM field (the full-path worst case), for each (band_rows, slab)
combination -- isolates the round-4 grid restructure's per-step overhead
from the band-granular slab's engagement win without recompiling the
whole pipeline per point.

Needs tools/_bandstats_fields.npz (python tools/scratch_bandstats.py --dump).
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import functools

import jax.numpy as jnp

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data
from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
    prepare_volumes, window_plane_cost_prepared)

H, W, MD = 375, 450, 60

fields = np.load(os.path.join(_REPO, "tools", "_bandstats_fields.npz"))
pair = make_pair(h=H, w=W, max_dis=MD, seed=0)
cfg = CSPMConfig(max_dis=MD, dis_scale=4, cost_method=CostMethod.GRD,
                 use_cs=False, use_pp=False)
vd = jax.jit(lambda a, b: build_volume_data(a, b, cfg))(
    jnp.asarray(pair.left), jnp.asarray(pair.right))
prep = prepare_volumes(vd.imgs[0], vd.vols[0], half_wnd=cfg.half_wnd)
prep = jax.tree_util.tree_map(jnp.asarray, prep)
mc = vd.max_costs[0]

abc_conv = jnp.asarray(fields["converged"])[:, None]      # [2,1,H,W,3]
key = jax.random.PRNGKey(0)
from crossscalepatchmatch_tpu.ops import plane
abc_rand = plane.random_planes(key, (2, H, W), float(MD), 1e-8)[:, None]


def timed(fn, a, reps=5):
    out = fn(a)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(a)
        s = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


for band_rows in (64, 32, 16, 8):
    for slab in (32, 16):
        fn = jax.jit(functools.partial(
            window_plane_cost_prepared, prep, mc, half_wnd=cfg.half_wnd,
            max_dis=MD, gamma=cfg.wgt_gamma, slab=slab,
            band_rows=band_rows))
        tc = timed(fn, abc_conv)
        tr = timed(fn, abc_rand)
        print(f"band={band_rows:2d} slab={slab:2d}: converged "
              f"{tc*1e3:6.1f} ms  random {tr*1e3:6.1f} ms", flush=True)

# no-slab reference point (pure full path, tile bands)
fn = jax.jit(functools.partial(
    window_plane_cost_prepared, prep, mc, half_wnd=cfg.half_wnd,
    max_dis=MD, gamma=cfg.wgt_gamma, slab=0, band_rows=64))
print(f"slab off (band=64): converged {timed(fn, abc_conv)*1e3:6.1f} ms  "
      f"random {timed(fn, abc_rand)*1e3:6.1f} ms", flush=True)
