"""Repro: the jnp (non-Pallas) cross-scale plane cost crashes the
XLA:TPU worker when it runs inside the full optimizer pipeline.

This is the upstream compiler/runtime bug behind the TPU guard in
models/patchmatch.py (make_cost_fns raises RuntimeError "not supported
on TPU" instead of selecting the jnp cross-scale path): with the
upsampled-roll gather pattern of ops.plane_cost inside the PatchMatch
optimizer program, the TPU worker process aborts ("UNAVAILABLE: TPU
worker process crashed or restarted") -- not a Python exception, the
whole runtime dies.  The Pallas kernel is the production TPU
cross-scale path because of it.

ROUND-5 NARROWING (jax 0.9.0, TPU v5e, 2026-08-20, both forms run):
  * STANDALONE cross_scale_plane_cost evaluations now SURVIVE at every
    shape tried, up to the full production geometry (375x450, d=60,
    wnd=35, 5 levels) -- rounds 2-4 reported even single evaluations
    aborting, so upstream has improved;
  * the FULL PIPELINE form (this script with --pipeline; 96x130, d=16,
    wnd=35, 2 levels, ONE optimizer iteration) still kills the worker.
The guard therefore stays, scoped to the pipeline reality; retire it
(and this script) when --pipeline prints NO CRASH.

WARNING: --pipeline WILL kill this process's TPU runtime (the tunnel
recovers for new processes).  Usage:

    python tools/repro_jnp_cs_tpu_crash.py                   # refuses
    python tools/repro_jnp_cs_tpu_crash.py --crash           # standalone eval form
    python tools/repro_jnp_cs_tpu_crash.py --crash --bench-shape  # ... at 375x450x5L
    python tools/repro_jnp_cs_tpu_crash.py --crash --pipeline     # the crashing form
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--crash" not in sys.argv:
    print(__doc__)
    sys.exit("refusing to run without --crash (this kills the TPU worker)")

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", "repro needs the TPU backend"

if "--pipeline" in sys.argv:
    # The form that still crashes: the jnp cross-scale cost fn INSIDE the
    # optimizer pipeline.  Constructed directly (models.patchmatch's
    # make_cost_fns guards this path off on TPU).
    import functools

    import numpy as np

    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.models import patchmatch as pm
    from crossscalepatchmatch_tpu.ops.cost_volume import build_volume_data
    from crossscalepatchmatch_tpu.ops.plane_cost import (
        cross_scale_plane_cost)
    from crossscalepatchmatch_tpu.ops.scale_weights import scale_weights

    cfg = CSPMConfig(max_dis=16, dis_scale=8, cost_method=CostMethod.CEN,
                     use_cs=True, scale_num=2, reg_lambda=0.3,
                     use_pallas=False, max_iter=1, adopt_mode="exact",
                     prescreen_stride=1)
    pair = make_pair(h=96, w=130, max_dis=16, seed=2)
    vd = build_volume_data(jnp.asarray(pair.left), jnp.asarray(pair.right),
                           cfg)
    wgts = tuple(float(x) for x in
                 scale_weights(cfg.scale_num, cfg.reg_lambda))

    def eval_view(imgs, vols, max_costs, abc):
        return cross_scale_plane_cost(
            imgs, vols, max_costs, wgts, abc, half_wnd=cfg.half_wnd,
            max_dis=cfg.max_dis, gamma=cfg.wgt_gamma)

    def cost_fn(abc2):
        return jax.vmap(eval_view)(vd.weight_imgs, vd.vols, vd.max_costs,
                                   abc2)

    print("running ONE optimizer iteration on the jnp cross-scale cost "
          "(expected: TPU worker abort)...", flush=True)
    run = jax.jit(functools.partial(pm.patchmatch, hw=(96, 130),
                                    cost_fn=cost_fn, cfg=cfg))
    state = run(jax.random.PRNGKey(0))
    print("NO CRASH:", float(jnp.sum(state.cost)),
          "-- pipeline form survived; retire the TPU guard in "
          "models/patchmatch.py and this script.")
    sys.exit(0)

from crossscalepatchmatch_tpu.ops.plane_cost import cross_scale_plane_cost
from crossscalepatchmatch_tpu.ops.scale_weights import scale_weights

if "--bench-shape" in sys.argv:
    # the shape the production pipeline would evaluate
    h, w, max_dis, wnd, levels = 375, 450, 60, 35, 5
else:
    h, w, max_dis, wnd, levels = 96, 130, 20, 35, 2

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
imgs = [jax.random.randint(k1, ((h + (1 << s) - 1) >> s,
                                (w + (1 << s) - 1) >> s, 3), 0, 255,
                           jnp.uint8) for s in range(levels)]
# per-level volumes with the halved disparity bound (pre_cs_pc.cc:48)
vols, md = [], max_dis
for s in range(levels):
    hs, ws = imgs[s].shape[:2]
    vols.append(jax.random.uniform(k2, (hs, ws, md + 1), jnp.float32))
    md //= 2
max_costs = jnp.ones((levels,), jnp.float32)
abc = jax.random.uniform(k3, (1, h, w, 3), jnp.float32, -1, 1)

wgts = tuple(float(x) for x in scale_weights(levels, 0.3))
print("evaluating the STANDALONE jnp cross-scale plane cost at wnd=35 "
      "on TPU (round-5 observation: this form no longer crashes)...",
      flush=True)
out = cross_scale_plane_cost(imgs, vols, max_costs, wgts, abc,
                             half_wnd=wnd // 2, max_dis=max_dis,
                             gamma=10.0)
print("standalone eval survived:", float(jnp.sum(out)),
      "(expected since round 5; the crashing form is --pipeline)")
