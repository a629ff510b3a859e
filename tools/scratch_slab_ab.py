"""A/B the disparity-slab path at KITTI depth, cross-scale, and warm-start.

Round-4 decision input: the slab measured net-negative on the bench
workload in every (band_rows, slab) combination; this checks the three
workloads where the tradeoff could differ (dpad=128, per-level coarse
volumes, converged warm-start fields) before the machinery is removed.
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

import jax.numpy as jnp

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
from crossscalepatchmatch_tpu.models.pipeline import run_pair, run_pair_warm


def bench_cfg(name, pair, cfg, thr):
    l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
    t0 = time.perf_counter()
    out = run_pair(l, r, jnp.int32(0), cfg)
    s = np.asarray(out["dis"]).sum()
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = run_pair(l, r, jnp.int32(i + 1), cfg)
        s += np.asarray(out["dis"]).sum()
    dt = (time.perf_counter() - t0) / n
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, thr)
    print(f"{name}: {dt*1e3:.0f} ms/pair (compile {tc:.0f}s) bad={bad:.4f}",
          flush=True)


def main():
    pk = make_pair(h=375, w=1242, max_dis=128, seed=0)
    for slab, band in ((0, 64), (32, 32), (16, 8)):
        cfg = CSPMConfig(max_dis=128, dis_scale=2,
                         cost_method=CostMethod.GRD, use_pp=True,
                         pallas_slab=slab, pallas_band_rows=band)
        bench_cfg(f"kitti slab={slab} band={band}", pk, cfg, 3.0)

    pc = make_pair(h=375, w=450, max_dis=60, seed=0)
    for slab, band in ((0, 64), (32, 32)):
        cfg = CSPMConfig(max_dis=60, dis_scale=4,
                         cost_method=CostMethod.CEN, use_cs=True,
                         scale_num=5, reg_lambda=0.3, use_pp=True,
                         pallas_slab=slab, pallas_band_rows=band)
        bench_cfg(f"cen_cs_pp slab={slab} band={band}", pc, cfg, 1.0)

    for slab, band in ((0, 64), (16, 8)):
        cfg = CSPMConfig(max_dis=60, dis_scale=4,
                         cost_method=CostMethod.GRD, use_cs=False,
                         use_pp=False, pallas_slab=slab,
                         pallas_band_rows=band)
        l, r = jnp.asarray(pc.left), jnp.asarray(pc.right)
        abc = run_pair(l, r, jnp.int32(0), cfg)["abc"]
        jax.block_until_ready(abc)
        t0 = time.perf_counter()
        out = run_pair_warm(l, r, jnp.int32(1), abc, cfg)
        s = np.asarray(out["dis"]).sum()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            out = run_pair_warm(l, r, jnp.int32(i + 2), abc, cfg)
            s += np.asarray(out["dis"]).sum()
        dt = (time.perf_counter() - t0) / n
        print(f"warm slab={slab} band={band}: {dt*1e3:.0f} ms/frame "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
