"""Scratch: where does the TPU cold compile go?

Times, with a COLD persistent cache (pass --cold to move .jax_cache aside):
  1. trace+lower of the full default pipeline
  2. backend compile of the full pipeline
  3. standalone compiles of each kernel instantiation the pipeline uses
"""
import os
import shutil
import sys
import time

import jax

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
if "--cold" not in sys.argv:
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.models import patchmatch as pm
from crossscalepatchmatch_tpu.models.pipeline import run_pair
from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data

h, w, max_dis = 375, 450, 60
pair = make_pair(h=h, w=w, max_dis=max_dis, seed=0)
l = jnp.asarray(pair.left)
r = jnp.asarray(pair.right)
cfg = CSPMConfig(max_dis=max_dis, dis_scale=4, cost_method=CostMethod.GRD,
                 use_cs=False, use_pp=False)
print("device:", jax.devices()[0].device_kind, flush=True)

# --- standalone kernel instantiations first (so the pipeline compile
# below shows what ISN'T the kernels when cache is warm within-process)
vd = build_volume_data(l, r, cfg)
cost_fn, sparse_fn = pm.make_cost_fns(cfg, vd)
abc = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, h, w, 3))
for name, fn, k in (("full K=1", cost_fn, 1), ("full K=2", cost_fn, 2),
                    ("full K=8", cost_fn, 8), ("sparse K=8", sparse_fn, 8)):
    if fn is None:
        continue
    a = jnp.broadcast_to(abc, (2, k, h, w, 3))
    t0 = time.perf_counter()
    jf = jax.jit(fn)
    lo = jf.lower(a)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        lo.compile()
    except Exception as e:  # noqa: BLE001
        # standalone jit of the quadrant sparse_fn embeds the ~350 MB
        # bq/wq volumes as CONSTANTS and overflows the remote compile
        # service's request limit (HTTP 413) -- a driver artifact; in
        # the pipeline they are traced values and compile fine
        print(f"{name}: compile failed ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:90]})", flush=True)
        continue
    print(f"{name}: lower {t_lo:.1f}s compile {time.perf_counter()-t0:.1f}s",
          flush=True)

# --- full pipeline
f = jax.jit(run_pair, static_argnames=("cfg",))
t0 = time.perf_counter()
lo = f.lower(l, r, jnp.int32(0), cfg)
t_lo = time.perf_counter() - t0
t0 = time.perf_counter()
lo.compile()
print(f"pipeline: lower {t_lo:.1f}s compile {time.perf_counter()-t0:.1f}s",
      flush=True)
