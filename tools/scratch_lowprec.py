"""Scratch: does the v5e VPU pack low-precision elementwise ops?

The round-4 verdict's one untried efficiency lever is precision: the
window-cost kernel's dense tent contraction is all-f32, while census
costs are integers 0-80 and GRD costs live in [0, 2.8].  Whether a
bf16 (or int8) contraction can beat f32 depends entirely on whether
Mosaic emits PACKED low-precision VPU arithmetic on this chip (2 lanes
per 32-bit register for bf16, 4 for int8) or widens everything to f32.

This microbenchmark times the kernel-relevant op mixes per dtype:
  * fma   -- v*c1 + c2                     (the contraction's mac)
  * tent  -- max(0, 1 - |v - c|)           (the tent build)
  * cmpsel-- where(v == c, a, v) + b       (the equality-delta form)

Method: one Pallas kernel per (dtype, mix), a fori_loop applying a
16-deep dependent chain to a VMEM block; two loop sizes cancel the
fixed call cost (same protocol as utils.roofline.measure_vpu_peak).
Reports effective ops/s; the f32 row is the reference.
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

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 16
N_IND = 8            # independent chains (throughput, not latency)
BH = 32              # rows per chain block
SHAPE = (N_IND * BH, 512)   # elements per block (f32: 512 KB)


def make(dtype, mix):
    def chain(v):
        # constants built in-kernel (captured tracers are rejected)
        if dtype == jnp.int8:
            c1 = np.int8(3)
            c2 = np.int8(1)
        else:
            c1 = np.asarray(1.0000001, dtype)
            c2 = np.asarray(1e-3, dtype)
        for _ in range(UNROLL):
            if mix == "fma":
                v = v * c1 + c2                       # 2 ops
            elif mix == "tent":
                v = jnp.maximum(np.asarray(0, dtype),
                                np.asarray(1, dtype)
                                - jnp.abs(v - c2))    # 4 ops
            elif mix == "cmpsel":
                v = jnp.where(v == c1, v + c2, v) + c2  # 4 ops
        return v

    # per fori step: UNROLL links x N_IND chains x (BH*512) elements
    # = UNROLL * SHAPE elements, so ops_per is per SHAPE element
    ops_per = {"fma": 2, "tent": 4, "cmpsel": 4}[mix] * UNROLL

    def kern(x_ref, o_ref, *, n):
        # N_IND independent dependency chains interleaved, so the
        # measurement is VPU THROUGHPUT, not dependent-op latency
        def body(i, vs):
            return tuple(chain(v) for v in vs)

        init = tuple(x_ref[pl.ds(j * BH, BH), :] for j in range(N_IND))
        outs = jax.lax.fori_loop(0, n, body, init)
        for j in range(N_IND):
            o_ref[pl.ds(j * BH, BH), :] = outs[j]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        return pl.pallas_call(
            functools.partial(kern, n=n),
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).random(SHAPE) * 0.5, dtype)

    def timed(n):
        jnp.asarray(run(x, n)).block_until_ready()
        np.asarray(run(x, n))          # settle
        t0 = time.perf_counter()
        np.asarray(run(x, n))
        return time.perf_counter() - t0

    n_lo, n_hi = 512, 8192
    ops = (n_hi - n_lo) * ops_per * SHAPE[0] * SHAPE[1]
    best = 0.0
    for _ in range(3):
        dt = timed(n_hi) - timed(n_lo)
        best = max(best, ops / max(dt, 1e-9))
    return best


def main():
    rows = {}
    for mix in ("fma", "tent", "cmpsel"):
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                            ("i8", jnp.int8)):
            try:
                r = make(dtype, mix)
            except Exception as e:  # noqa: BLE001 -- report and move on
                print(f"{mix:8s} {name:5s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            rows[(mix, name)] = r
            base = rows.get((mix, "f32"))
            rel = f"  {r / base:4.2f}x f32" if base else ""
            print(f"{mix:8s} {name:5s} {r/1e12:6.2f} Tops/s{rel}",
                  flush=True)


if __name__ == "__main__":
    main()
