"""Scratch: attribute the CEN+CS(5)+PP pipeline (VERDICT r4 item 6).

Times, at the bench geometry (375x450, d=60, CEN, 5 scales, PP):
  * the full pipeline and its use_pp=False / use_cs=False variants
    (differences attribute PP and the cross-scale premium);
  * the volume-data build (census pyramids + per-level volumes) and the
    kernel-layout prepare;
  * one K=1 cross-scale exact eval, and each pyramid level's kernel
    alone (loop-cancellation timing, one dispatch per measure).

Usage: python tools/scratch_cs_levels.py
"""
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

from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
from crossscalepatchmatch_tpu.data import make_pair
from crossscalepatchmatch_tpu.models.pipeline import run_pair
from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data
from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
    _invoke, plane_params, prepare_cross_scale)
from crossscalepatchmatch_tpu.ops.scale_weights import scale_weights

H, W, D = 375, 450, 60
N_LO, N_HI = 2, 6


def timed_pipeline(cfg, l, r, reps=3):
    # warm by HOST MATERIALIZATION: block_until_ready returns early
    # through the tunnel, leaking cold compile into the timed region
    int(np.asarray(run_pair(l, r, jnp.int32(0), cfg)["dis"]).sum())
    int(np.asarray(run_pair(l, r, jnp.int32(0), cfg)["dis"]).sum())
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        int(np.asarray(run_pair(l, r, jnp.int32(i), cfg)["dis"]).sum())
    return (time.perf_counter() - t0) / reps


def timed_burn(burn, *args, reps=4):
    def one(n):
        t0 = time.perf_counter()
        float(burn(*args, n=n))
        return time.perf_counter() - t0

    float(burn(*args, n=N_LO))
    float(burn(*args, n=N_HI))
    best = min(max(one(N_HI) - one(N_LO), 1e-9) for _ in range(reps))
    return best / (N_HI - N_LO)


def main():
    pair = make_pair(h=H, w=W, max_dis=D, seed=0)
    l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
    base = dict(max_dis=D, dis_scale=4, cost_method=CostMethod.CEN,
                scale_num=5, reg_lambda=0.3)

    for label, kw in (("CEN+CS+PP", dict(use_cs=True, use_pp=True)),
                      ("CEN+CS", dict(use_cs=True, use_pp=False)),
                      ("CEN+PP", dict(use_cs=False, use_pp=True)),
                      ("CEN", dict(use_cs=False, use_pp=False))):
        cfg = CSPMConfig(**base, **kw)
        print(f"pipeline {label:10s} {timed_pipeline(cfg, l, r)*1e3:7.0f} ms",
              flush=True)

    cfg = CSPMConfig(**base, use_cs=True, use_pp=True)

    # volume-data build (census pyramids + volumes) and kernel prepare
    @jax.jit
    def build(lx, rx):
        vd = build_volume_data(lx, rx, cfg)
        return vd

    vd = build(l, r)
    jax.block_until_ready(jax.tree_util.tree_leaves(vd))
    t0 = time.perf_counter()
    for _ in range(3):
        vd = build(l, r)
        float(jnp.sum(jax.tree_util.tree_leaves(vd)[0]))
    print(f"volume-data build   {(time.perf_counter()-t0)/3*1e3:7.0f} ms",
          flush=True)

    preps = jax.jit(lambda v: prepare_cross_scale(
        v.weight_imgs, v.vols, half_wnd=cfg.half_wnd))(vd)
    wgts = tuple(float(x) for x in scale_weights(5, 0.3))
    rng = np.random.default_rng(0)
    abc = jnp.asarray(rng.random((2, 1, H, W, 3), np.float32))

    # per-level K=1 eval: loop-cancellation over _invoke of that level
    md = D
    total = 0.0
    for s, prep in enumerate(preps):
        @functools.partial(jax.jit, static_argnames=("n",))
        def burn(abc_, mc, n, prep=prep, md=md):
            def body(i, acc):
                params = plane_params(abc_ + acc * 0.0, th=64, tw=128)
                out = _invoke(prep, mc, params, half_wnd=cfg.half_wnd,
                              max_dis_s=md, gamma=cfg.wgt_gamma, th=64,
                              tw=128)
                return acc + jnp.sum(out[:, :, ::64, ::64])
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        dt = timed_burn(burn, abc, vd.max_costs[s])
        total += dt
        print(f"level {s} (d_s={md:3d}, dpad={prep.vol_p.shape[2]:3d}) "
              f"K=1 eval {dt*1e3:7.1f} ms", flush=True)
        md //= 2
    print(f"sum of levels       {total*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
