"""Scratch: isolate the ~125 ms fixed cost of a full window-cost eval.

Sweeps K (marginal vs fixed) and pallas_slab (does the fixed part scale
with tent depth?), timing by host materialization (tunnel-safe).
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
from crossscalepatchmatch_tpu.models import patchmatch as pm
from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data

h, w, max_dis = 375, 450, 60
pair = make_pair(h=h, w=w, max_dis=max_dis, seed=0)
l = jnp.asarray(pair.left)
r = jnp.asarray(pair.right)
print("device:", jax.devices()[0].device_kind, flush=True)


def timed(fn, a, reps=4):
    out = fn(a)                      # compile + warm
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(jnp.sum(fn(a)))
    return (time.perf_counter() - t0) / reps


key = jax.random.PRNGKey(0)
abc1 = pm.plane.random_planes(key, (2, h, w), float(max_dis), 1e-8)

for slab in (8, 16, 32, 64):
    cfg = CSPMConfig(max_dis=max_dis, dis_scale=4,
                     cost_method=CostMethod.GRD, use_cs=False,
                     use_pp=False, pallas_slab=slab)
    vd = build_volume_data(l, r, cfg)
    cost_fn, _ = pm.make_cost_fns(cfg, vd)
    jf = jax.jit(cost_fn)
    row = []
    for k in (1, 2, 4, 8):
        a = jnp.broadcast_to(abc1[:, None], (2, k, h, w, 3))
        # vary planes per k so the slab bound is realistic
        a = a + jax.random.normal(jax.random.PRNGKey(k), a.shape) * 0.01
        row.append((k, timed(jf, a)))
    # linear fit: t = fixed + marg*k
    ks = np.array([k for k, _ in row], np.float64)
    ts = np.array([t for _, t in row], np.float64)
    A = np.vstack([np.ones_like(ks), ks]).T
    (fixed, marg), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(f"slab={slab}: " + "  ".join(f"K={k}:{t*1e3:.0f}ms"
                                       for k, t in row)
          + f"  -> fixed {fixed*1e3:.0f} ms, marginal {marg*1e3:.1f} ms/cand",
          flush=True)
