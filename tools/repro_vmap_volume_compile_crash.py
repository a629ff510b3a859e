"""Repro: vmapping the volume-path window-cost kernel over B >= 3 pairs
crashes the Mosaic/XLA:TPU compile helper.

Round-4 background (BASELINE.md "Single-chip multi-pair batching"): a
vmapped multi-pair pipeline -- Pallas kernels batch by growing the
kernel grid with a leading batch dimension -- measured no throughput win
at B=2 (0.93-0.96x single rate) and at B >= 3 the volume-path compile
crashed the remote compile helper (HTTP 500 from tpu_compile_helper,
subprocess exit 1 -- a compiler-side abort, not a Python error).  The
shipped models.pipeline.run_pairs therefore batches with lax.map
(sequential on-device, measured 1.00x single rate) instead of vmap.

This script reproduces the B >= 3 compile in isolation so the lax.map
workaround can be retired if an upstream Mosaic fix lands:

    python tools/repro_vmap_volume_compile_crash.py [--b 3]

If it prints "NO CRASH", the compile helper survived: re-evaluate
vmapped batching in models.pipeline.run_pairs (its round-4 measurements
still say lax.map is the right default -- one pair saturates the chip).

RESULT AT FILING (round 5, 2026-08-20; jax 0.9.0, TPU v5e through the
axon tunnel): the ISOLATED kernel vmap compiles clean at B=3 both at
the default geometry and at the bench geometry (--h 375 --w 450 --d
60) -- the round-4 crash evidently needed the full vmapped PIPELINE
program around the kernels (deleted in round 4; reconstructing it just
to crash a compiler was judged not worth it).  The lax.map batching in
run_pairs stands on its measured merits (1.00x single rate, dispatch
robustness) independent of the compiler bug, so nothing is blocked on
an upstream fix; this script remains as the quick kernel-level probe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", "repro needs the TPU backend"

from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
    window_plane_cost_pallas)

ap = argparse.ArgumentParser()
ap.add_argument("--b", type=int, default=3,
                help="batch size (2 compiled in round 4; >= 3 crashed)")
ap.add_argument("--h", type=int, default=192)
ap.add_argument("--w", type=int, default=256)
ap.add_argument("--d", type=int, default=32)
args = ap.parse_args()

# default geometry is moderate so the compile attempt is quick; the
# round-4 crash was at the bench geometry: --h 375 --w 450 --d 60
b, h, w, d, wnd, k = args.b, args.h, args.w, args.d, 35, 2
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, (b, 2, h, w, 3)), jnp.uint8)
vols = jnp.asarray(rng.random((b, 2, h, w, d + 1), np.float32))
mc = jnp.max(vols, axis=(2, 3, 4))
abc = jnp.asarray(rng.random((b, 2, k, h, w, 3), np.float32))

f = jax.vmap(lambda i, v, m, a: window_plane_cost_pallas(
    i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))

print(f"compiling vmapped volume kernel at B={b} "
      "(expected for B >= 3: tpu_compile_helper HTTP 500)...", flush=True)
out = f(imgs, vols, mc, abc)
print("NO CRASH:", float(jnp.sum(out)),
      "-- compile helper survived; re-evaluate vmapped run_pairs "
      "(round-4 measurements still favor lax.map).")
