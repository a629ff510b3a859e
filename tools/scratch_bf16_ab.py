"""Scratch: A/B the bf16-stored volume against f32 (VERDICT r4 item 1).

Measures, on hardware:
  * K=1 and K=8 full-window kernel evals at bench shape (375x450 d=60)
    and KITTI shape (375x1242 d=128), f32 vs bf16 volume storage;
  * the full run_pair pipeline wall clock for both vol_dtype settings
    at both shapes (production schedule).

Usage: python tools/scratch_bf16_ab.py [--kitti] [--pipeline]
"""
import argparse
import functools
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def eval_ab(h, w, d, k, vol_dtype, reps=6):
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        prepare_volumes, window_plane_cost_prepared)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), np.uint8))
    vols = jnp.asarray(rng.random((2, h, w, d + 1), np.float32) * 2.8)
    maxc = jnp.asarray([2.8, 2.8], jnp.float32)
    prep = prepare_volumes(imgs, vols, half_wnd=17, vol_dtype=vol_dtype)

    @jax.jit
    def f(abc):
        return window_plane_cost_prepared(
            prep, maxc, abc, half_wnd=17, max_dis=d, gamma=10.0)

    abc = jnp.asarray(rng.random((2, k, h, w, 3), np.float32))
    np.asarray(f(abc)); np.asarray(f(abc))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(f(abc))
    return (time.perf_counter() - t0) / reps


def pipeline_ab(h, w, d, vol_dtype, reps=3):
    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
    from crossscalepatchmatch_tpu.models.pipeline import run_pair

    cfg = CSPMConfig(max_dis=d, dis_scale=max(1, 240 // d),
                     cost_method=CostMethod.GRD, use_pp=False,
                     vol_dtype=vol_dtype)
    pair = make_pair(h=h, w=w, max_dis=d, seed=0)
    l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
    out = run_pair(l, r, jnp.int32(0), cfg)
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        int(np.asarray(run_pair(l, r, jnp.int32(i), cfg)["dis"]).sum())
    return (time.perf_counter() - t0) / reps, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", action="store_true")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--k", type=int, default=0, help="0 = both 1 and 8")
    args = ap.parse_args()
    h, w, d = (375, 1242, 128) if args.kitti else (375, 450, 60)
    if args.pipeline:
        for vd in ("f32", "bf16"):
            dt, bad = pipeline_ab(h, w, d, vd)
            print(f"pipeline {h}x{w} d={d} {vd:5s} {dt*1e3:8.0f} ms/pair"
                  f"  bad {bad:.4f}", flush=True)
        return
    ks = [args.k] if args.k else [1, 8]
    for k in ks:
        for name, vd in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            dt = eval_ab(h, w, d, k, vd)
            print(f"eval {h}x{w} d={d} K={k} {name:5s} {dt*1e3:8.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
