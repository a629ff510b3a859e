"""Scratch: intra-kernel cycle attribution of the window-cost launch.

VERDICT round-4 item 2: the kernel executes at ~38% of the measured VPU
ceiling and the other 62% was never attributed.  This driver times the
REAL production kernel (ops.pallas.window_cost) with single components
knocked out via its `_ablate` hook, at the bench shape (375x450, d=60)
and KITTI shape (375x1242, d=128), K=1 and K=8.  The difference
full - knockout attributes that component's share of the launch.

Components (see _kernel):
  body   everything but DMA + grid overhead
  rot    the per-(kk, dy) sublane rotate of the image rows
  wgt    the whole ASW weight (L1 + exp)
  exp    the exp alone (L1 kept)
  tent   the tent build + multiply (vol read + depth sum kept)
  mac    ALL depth(dpad)-wide work: vol read, tent, mul, sum
  slice  unaligned static lane slices (q and vol windows) -> aligned

Usage: python tools/scratch_cycle.py [--kitti] [--reps 6]
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

from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
    prepare_volumes, window_plane_cost_prepared)

# Known artifact: the "no-exp" knockout (exp replaced by a multiply)
# compiles into a ~2.4x SLOWER program than the full kernel -- removing
# the transcendental changes Mosaic's scheduling for the worse, so the
# exp's own cost cannot be isolated this way; the full-weight knockout
# ("no-wgt") bounds l1+exp together.


def build(h, w, d, k, ablate):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), np.uint8))
    vols = jnp.asarray(rng.random((2, h, w, d + 1), np.float32) * 2.8)
    maxc = jnp.asarray([2.8, 2.8], jnp.float32)
    prep = jax.jit(functools.partial(prepare_volumes, half_wnd=17)
                   )(imgs, vols)

    @functools.partial(jax.jit, static_argnames=("n",))
    def burn(prep_, abc, n):
        # n launches inside ONE dispatch: the tunnel's ~30 ms dispatch
        # roundtrip and the D2H are paid once and cancelled by the
        # two-size difference below.  prep_ rides as an ARGUMENT -- a
        # closure constant embeds the padded volume in the compile
        # request and overflows the remote compile service at KITTI
        # size (HTTP 413).
        def body(i, acc):
            out = window_plane_cost_prepared(
                prep_, maxc, abc + acc * 0.0, half_wnd=17, max_dis=d,
                gamma=10.0, _ablate=frozenset(ablate))
            return acc + jnp.sum(out[:, :, ::64, ::64])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    abc = jnp.asarray(rng.random((2, k, h, w, 3), np.float32))
    return functools.partial(burn, prep), abc


N_LO, N_HI = 2, 8


def timed(burn, abc, reps):
    def one(n):
        t0 = time.perf_counter()
        float(burn(abc, n=n))
        return time.perf_counter() - t0

    float(burn(abc, n=N_LO))   # compile + settle
    float(burn(abc, n=N_HI))
    best = min(max(one(N_HI) - one(N_LO), 1e-9) for _ in range(reps))
    return best / (N_HI - N_LO)


CASES = [
    ("full", ()),
    ("no-slice", ("slice",)),
    ("no-rot", ("rot",)),
    ("no-exp", ("exp",)),
    ("no-wgt", ("wgt",)),
    ("no-tent", ("tent",)),
    ("no-mac", ("mac",)),
    ("body-off", ("body",)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--k", type=int, default=1)
    args = ap.parse_args()
    h, w, d = (375, 1242, 128) if args.kitti else (375, 450, 60)
    print(f"shape {h}x{w} d={d} K={args.k}", flush=True)
    times = {}
    for label, ab in CASES:
        f, abc = build(h, w, d, args.k, ab)
        times[label] = timed(f, abc, args.reps)
        print(f"{label:10s} {times[label]*1e3:8.1f} ms", flush=True)
    full = times["full"]
    print("\nattribution (full - knockout):")
    for label, _ in CASES[1:]:
        dt = full - times[label]
        print(f"  {label[3:] if label.startswith('no-') else label:8s}"
              f" {dt*1e3:8.1f} ms  {dt/full*100:5.1f}%")
    print(f"  {'dma+grid':8s} {times['body-off']*1e3:8.1f} ms  "
          f"{times['body-off']/full*100:5.1f}%")


if __name__ == "__main__":
    main()
