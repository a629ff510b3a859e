"""Repro: the jnp (non-Pallas) upsampled cross-scale plane cost crashes
the XLA:TPU worker at the production window size.

This is the upstream compiler/runtime bug behind the TPU guard at
models/patchmatch.py (make_cost_fns raises RuntimeError "not supported
on TPU" instead of selecting the jnp cross-scale path): the
upsampled-roll gather pattern of ops.plane_cost.window_plane_cost_upsampled
at wnd_size=35 aborts the TPU worker process -- not a Python exception,
the whole runtime dies (observed rounds 2-4; the Pallas kernel is the
only TPU cross-scale path because of it).

WARNING: running this WILL likely kill the TPU runtime for this process
(and can wedge the device tunnel for a while).  Run it only to check
whether an upstream fix has landed:

    python tools/repro_jnp_cs_tpu_crash.py          # refuses to run
    python tools/repro_jnp_cs_tpu_crash.py --crash  # actually runs

If it completes and prints "NO CRASH", the upstream bug is fixed: retire
this script and the guard in models/patchmatch.py (and re-enable the jnp
cross-scale path on TPU as a fallback).

Environment pinned at filing (round 5, 2026-08-20): jax 0.9.0, TPU v5e
(v5 lite) through the axon tunnel, single chip.
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

from crossscalepatchmatch_tpu.ops.plane_cost import cross_scale_plane_cost

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

print("evaluating jnp cross-scale plane cost at wnd=35 on TPU "
      "(expected: XLA:TPU worker abort)...", flush=True)
out = cross_scale_plane_cost(imgs, vols, max_costs, (0.6, 0.4), abc,
                             half_wnd=wnd // 2, max_dis=max_dis,
                             gamma=10.0)
print("NO CRASH: worker survived; upstream bug appears fixed -- retire "
      "this script and the TPU guard in models/patchmatch.py.",
      float(jnp.sum(out)))
