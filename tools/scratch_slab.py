"""Scratch: measure pallas_slab {8,16,32,48} on the bench workload."""
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import os as _os
jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
from crossscalepatchmatch_tpu.models.pipeline import run_pair

h, w, max_dis = 375, 450, 60
pair = make_pair(h=h, w=w, max_dis=max_dis, seed=0)
l = jnp.asarray(pair.left)
r = jnp.asarray(pair.right)

slabs = [int(s) for s in sys.argv[1:]] or [16]
for slab in slabs:
    cfg = CSPMConfig(max_dis=max_dis, dis_scale=4,
                     cost_method=CostMethod.GRD, use_cs=False, use_pp=False,
                     pallas_slab=slab)
    t0 = time.perf_counter()
    out = run_pair(l, r, jnp.int32(0), cfg)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
    iters = 3
    t0 = time.perf_counter()
    sink = 0
    for i in range(1, iters + 1):
        out = run_pair(l, r, jnp.int32(i), cfg)
        sink += int(np.asarray(out["dis"]).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"slab={slab}: {dt*1e3:.0f} ms/pair  bad={bad:.4f}  "
          f"compile {t_compile:.1f}s", flush=True)
