"""Measurement driver: re-measure the README/BASELINE workload table."""
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
from crossscalepatchmatch_tpu.models.pipeline import (run_pair,
                                                      run_pair_warm)

print("device:", jax.devices()[0].device_kind, flush=True)


def timed_pipeline(cfg, h, w, reps=3, thresh=1.0):
    pair = make_pair(h=h, w=w, max_dis=cfg.max_dis, seed=0)
    l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
    out = run_pair(l, r, jnp.int32(0), cfg)
    jax.block_until_ready(out)
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, thresh)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = run_pair(l, r, jnp.int32(i), cfg)
        s = int(np.asarray(out["dis"]).sum())
    return (time.perf_counter() - t0) / reps, bad


# README demo (the bench row, for cross-checking)
cfg = CSPMConfig(max_dis=60, dis_scale=4, cost_method=CostMethod.GRD,
                 use_cs=False, use_pp=False)
dt, bad = timed_pipeline(cfg, 375, 450)
print(f"readme_demo GRD 375x450 d60: {dt*1e3:.0f} ms/pair bad={bad:.4f}",
      flush=True)

# exact adopt mode
cfg_e = CSPMConfig(max_dis=60, dis_scale=4, cost_method=CostMethod.GRD,
                   use_cs=False, use_pp=False, adopt_mode="exact")
dt, bad = timed_pipeline(cfg_e, 375, 450)
print(f"exact-adopt GRD 375x450 d60: {dt*1e3:.0f} ms/pair bad={bad:.4f}",
      flush=True)

# CEN + CS + PP
cfg_cs = CSPMConfig(max_dis=60, dis_scale=4, cost_method=CostMethod.CEN,
                    use_cs=True, use_pp=True, reg_lambda=0.3)
dt, bad = timed_pipeline(cfg_cs, 375, 450)
print(f"CEN+CS+PP 375x450 d60: {dt*1e3:.0f} ms/pair bad={bad:.4f}",
      flush=True)

# KITTI-size
cfg_k = CSPMConfig(max_dis=128, dis_scale=1, cost_method=CostMethod.GRD,
                   use_pp=True)
dt, bad = timed_pipeline(cfg_k, 375, 1242, reps=2, thresh=3.0)
print(f"KITTI GRD 375x1242 d128+PP: {dt*1e3:.0f} ms/pair bad@3px={bad:.4f}",
      flush=True)

# warm-start video frame
cfg = CSPMConfig(max_dis=60, dis_scale=4, cost_method=CostMethod.GRD,
                 use_cs=False, use_pp=False)
pair = make_pair(h=375, w=450, max_dis=60, seed=0)
l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
out = run_pair(l, r, jnp.int32(0), cfg)
abc = out["abc"]
o2 = run_pair_warm(l, r, jnp.int32(1), abc, cfg)
jax.block_until_ready(o2)
t0 = time.perf_counter()
for i in range(3):
    o2 = run_pair_warm(l, r, jnp.int32(2 + i), abc, cfg)
    s = int(np.asarray(o2["dis"]).sum())
dt = (time.perf_counter() - t0) / 3
disp = np.asarray(o2["dis"][0], np.float32) / cfg.dis_scale
bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
print(f"warm frame GRD 375x450 d60: {dt*1e3:.0f} ms/frame bad={bad:.4f}",
      flush=True)
