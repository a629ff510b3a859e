"""Scratch: decompose bench time by schedule phase.

Times the full pipeline under adopt_mode in {rank, rank+exact, exact} and
the standalone phases (volume+quadrant build, single rank eval, single
exact eval at K=1/2/9) to attribute the 1.43 s/pair.
"""
import os
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

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
from crossscalepatchmatch_tpu.models import patchmatch as pm
from crossscalepatchmatch_tpu.models.pipeline import run_pair
from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data

h, w, max_dis = 375, 450, 60
pair = make_pair(h=h, w=w, max_dis=max_dis, seed=0)
l = jnp.asarray(pair.left)
r = jnp.asarray(pair.right)
print("device:", jax.devices()[0].device_kind, flush=True)


def timed(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*a)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


# --- full pipeline per adopt_mode ---------------------------------------
base = dict(max_dis=max_dis, dis_scale=4, cost_method=CostMethod.GRD,
            use_cs=False, use_pp=False)
for mode in ("rank", "rank+exact", "exact"):
    cfg = CSPMConfig(**base, adopt_mode=mode)
    dt = timed(lambda s: run_pair(l, r, s, cfg), jnp.int32(1))
    out = run_pair(l, r, jnp.int32(0), cfg)
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
    print(f"pipeline adopt={mode:<11}: {dt*1e3:.0f} ms/pair bad={bad:.4f}",
          flush=True)

# --- standalone phases ----------------------------------------------------
cfg = CSPMConfig(**base)
vd_f = jax.jit(lambda a, b: build_volume_data(a, b, cfg))
print(f"volume build: {timed(vd_f, l, r)*1e3:.0f} ms", flush=True)
vd = vd_f(l, r)

from crossscalepatchmatch_tpu.ops.prescreen_volume import (
    build_quadrant_volumes)
import functools
qb = jax.jit(jax.vmap(functools.partial(
    build_quadrant_volumes, half_wnd=cfg.half_wnd, gamma=cfg.wgt_gamma,
    stride=cfg.prescreen_stride)))
print(f"quadrant build: {timed(qb, vd.imgs[0], vd.vols[0])*1e3:.0f} ms",
      flush=True)

cost_fn, sparse_fn = pm.make_cost_fns(cfg, vd)
key = jax.random.PRNGKey(0)
abc1 = pm.plane.random_planes(key, (2, h, w), float(max_dis), 1e-8)
jexact = jax.jit(cost_fn)
jrank = jax.jit(sparse_fn)
for k in (1, 2, 9):
    a = jnp.broadcast_to(abc1[:, None], (2, k, h, w, 3))
    a = a + jax.random.normal(jax.random.PRNGKey(k), a.shape) * 0.01
    print(f"exact eval K={k}: {timed(jexact, a)*1e3:.0f} ms", flush=True)
for k in (8,):
    a = jnp.broadcast_to(abc1[:, None], (2, k, h, w, 3))
    a = a + jax.random.normal(jax.random.PRNGKey(k), a.shape) * 0.01
    print(f"rank  eval K={k}: {timed(jrank, a)*1e3:.0f} ms", flush=True)

# --- tunnel RTT: D2H sync latency on a trivial op ------------------------
x = jnp.ones((8, 128), jnp.float32)
tiny = jax.jit(lambda a: a + 1.0)
tiny(x)
t0 = time.perf_counter()
for _ in range(20):
    float(jnp.sum(tiny(x)))
print(f"tunnel RTT (tiny op sync): {(time.perf_counter()-t0)/20*1e3:.1f} ms",
      flush=True)
