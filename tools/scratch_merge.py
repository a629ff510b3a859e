"""Scratch: measure merge_view {True,False} on the bench workload."""
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

for merge in (False, True):
    for adopt in ("rank+exact", "exact"):
        cfg = CSPMConfig(max_dis=max_dis, dis_scale=4,
                         cost_method=CostMethod.GRD, use_cs=False,
                         use_pp=False, adopt_mode=adopt, merge_view=merge)
        t0 = time.perf_counter()
        out = run_pair(l, r, jnp.int32(0), cfg)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        bads = []
        iters = 3
        t0 = time.perf_counter()
        for i in range(0, iters):
            out = run_pair(l, r, jnp.int32(i), cfg)
            disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
            bads.append(bad_pixel_rate(disp, pair.disp_left,
                                       pair.valid_left, 1.0))
        dt = (time.perf_counter() - t0) / iters
        print(f"merge_view={merge} adopt={adopt}: {dt*1e3:.0f} ms/pair  "
              f"bad={np.mean(bads):.4f}  compile {t_compile:.1f}s",
              flush=True)
