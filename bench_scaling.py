"""Scaling-efficiency benchmark for the sharded (mesh) pipeline.

Measures stereo pairs/s on 1 device vs the full mesh, for the BASELINE.json
scaling-efficiency target (>= 80% at >= 2 hosts).  Run on a real TPU slice
or pod; on this development host (one chip through a tunnel) only mesh
(1, 1) is available and on the 8-virtual-device CPU mesh the numbers
measure the mechanism, not the hardware — both are labeled as such.

Usage:
  python bench_scaling.py [--h 384] [--w 448] [--max_dis 60] [--batch 0]
With --batch N > 0 a fixed batch of N pairs is sharded over the "data"
axis; otherwise a single pair is row-sharded over all devices.  Both are
strong-scaling measurements (fixed total work, growing device count).

Prints one JSON line per mesh configuration.
"""

import argparse
import json
import sys
import time


def run(mesh, cfg, pairs_l, pairs_r, seeds):
    import jax
    import os as _os
    # persistent compile cache (env-var spelling is not
    # honored by this JAX build -- set programmatically):
    # repeat runs, and driver rounds with an unchanged
    # kernel, skip the multi-minute XLA compile entirely
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      ".jax_cache"))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", 0)

    from crossscalepatchmatch_tpu.parallel.tiled import jit_run_batch_sharded

    fn = jit_run_batch_sharded(cfg, mesh)
    out = fn(pairs_l, pairs_r, seeds)          # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(pairs_l, pairs_r, seeds + 1)
    # force full materialization (block_until_ready alone can return
    # early through the axon tunnel)
    import numpy as np
    np.asarray(out).sum()
    return time.perf_counter() - t0


def project(args):
    """Analytic multi-chip/multi-host scaling projection.

    This rig has one TPU chip behind a tunnel, so the >=80%-at->=2-hosts
    BASELINE.json target cannot be *measured* here; it can be argued from
    the pipeline's communication structure (parallel/tiled.py) and the
    published TPU v5e fabric numbers.  Per outer iteration, one device
    exchanges:

      * spatial sweeps (tiled.py extend_axis): 2 views x 2 sides x
        (far_ring + half_wnd) halo rows (or columns) of the f32 plane
        field [.., 3] per sweep, multi-hop ppermutes riding ICI;
      * view propagation under tx sharding (tiled.py _abc_global_x): one
        all_gather of the local rows' plane field along tx,
        (n_tx-1)/n_tx of 2 x hs x W x 3 f32 received per device;
      * everything else (refinement, prescreen, cost evals) is local.

    Compute per device is the measured single-chip wall clock divided by
    the device count (the kernel is embarrassingly tile-parallel; grid
    steps have no cross-tile dependencies).  Efficiency =
    t_comp / (t_comp + t_comm), with every exchange charged at the slow
    fabric for the mesh axes that cross hosts (DCN) and ICI otherwise --
    overlap is ignored (pessimistic) and compute imbalance is bounded by
    the tile round-up (<= one 64-row tile band per device, charged too).
    """
    # fabric bandwidths per chip, bytes/s: TPU v5e ICI ~1.6 Tbps/chip
    # aggregate (4 links x 400 Gbps) -> use one link 50 GB/s per exchange
    # direction (pessimistic); DCN per host ~ 25 GB/s shared by 8 chips.
    BW_ICI = 50e9
    BW_DCN = 25e9 / 8
    h, w, d = args.h, args.w, args.max_dis
    cfg_iters, sweeps, far, hb = 3, 2, 25, args.wnd // 2
    t1 = args.t1  # measured single-chip s/pair for this workload
    rows = []
    for n_hosts, n_chips in ((1, 4), (1, 8), (2, 16), (4, 32)):
        # mesh (data=n_hosts, ty=chips_per_host): batch dim across hosts
        # (zero steady-state cross-host traffic -- each pair lives on one
        # host), rows across the host's chips.
        ty = n_chips // n_hosts
        hs = -(-h // ty)
        halo_bytes = (cfg_iters * sweeps * 2 * 2 * (far + hb) * w * 3 * 4)
        t_comm = halo_bytes / BW_ICI
        t_comp = t1 * (hs * ty) / h / ty   # round-up imbalance included
        eff = t_comp / (t_comp + t_comm)
        rows.append({"hosts": n_hosts, "chips": n_chips,
                     "mesh": f"(data={n_hosts}, ty={ty})",
                     "t_comp_s": round(t_comp, 4),
                     "t_comm_s": round(t_comm, 6),
                     "projected_efficiency": round(eff, 4)})
        # alternative: one pair's rows spread across ALL chips of 2 hosts
        # (ty crosses hosts; halos at host boundaries ride DCN)
        if n_hosts > 1:
            ty_all = n_chips
            hs2 = -(-h // ty_all)
            dcn_halo = (cfg_iters * sweeps * 2 * 2 * (far + hb) * w * 3 * 4)
            t_comm2 = dcn_halo / BW_DCN
            t_comp2 = t1 * (hs2 * ty_all) / h / ty_all
            rows.append({"hosts": n_hosts, "chips": n_chips,
                         "mesh": f"(ty={ty_all} across hosts)",
                         "t_comp_s": round(t_comp2, 4),
                         "t_comm_s": round(t_comm2, 6),
                         "projected_efficiency": round(
                             t_comp2 / (t_comp2 + t_comm2), 4)})
    print(json.dumps({
        "metric": "projected_scaling_efficiency",
        "workload": f"{h}x{w} max_dis={d} GRD, t1={t1}s/pair",
        "model": "t_comp/(t_comp+t_comm), no overlap, ICI 50GB/s link, "
                 "DCN 25GB/s/host over 8 chips (pessimistic)",
        "target": ">=0.80 at >=2 hosts",
        "rows": rows,
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=448)
    ap.add_argument("--max_dis", type=int, default=60)
    ap.add_argument("--wnd", type=int, default=35)
    ap.add_argument("--project", action="store_true",
                    help="print the analytic multi-host scaling "
                         "projection instead of measuring")
    ap.add_argument("--t1", type=float, default=1.05,
                    help="measured single-chip s/pair for --project")
    ap.add_argument("--batch", type=int, default=0,
                    help=">0: shard a fixed batch of N pairs over 'data'")
    args = ap.parse_args()
    if args.project:
        return project(args)

    from crossscalepatchmatch_tpu.utils.probe import backend_reachable
    import jax
    if not backend_reachable():
        print("bench_scaling: device backend unreachable, aborting",
              file=sys.stderr)
        sys.exit(2)
    import jax.numpy as jnp

    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    plat = jax.devices()[0].platform
    cfg = CSPMConfig(max_dis=args.max_dis, dis_scale=4, wnd_size=args.wnd,
                     cost_method=CostMethod.GRD)

    def mk_batch(b):
        ps = [make_pair(h=args.h, w=args.w, max_dis=args.max_dis, seed=s)
              for s in range(b)]
        return (jnp.stack([jnp.asarray(p.left) for p in ps]),
                jnp.stack([jnp.asarray(p.right) for p in ps]),
                jnp.arange(b, dtype=jnp.int32))

    results = []
    if args.batch > 0:      # fixed batch sharded over "data" (strong scaling)
        for n in sorted({1, n_dev}):
            if args.batch % n:
                continue
            l, r, s = mk_batch(args.batch)
            dt = run(make_mesh(n, 1), cfg, l, r, s)
            results.append((f"data={n}", args.batch / dt))
    else:                   # strong scaling: one pair's rows over "ty"
        l, r, s = mk_batch(1)
        for n in sorted({1, n_dev}):
            if args.h % n or args.h // n < cfg.half_wnd:
                continue
            dt = run(make_mesh(1, n), cfg, l, r, s)
            results.append((f"ty={n}", 1.0 / dt))

    base = results[0][1]
    for name, pps in results:
        n = int(name.split("=")[1])
        eff = pps / (base * n) if n > 1 else 1.0
        print(json.dumps({
            "metric": "sharded_pairs_per_second", "mesh": name,
            "value": round(pps, 4), "efficiency_vs_1dev": round(eff, 3),
            "platform": plat,
            "note": ("virtual CPU mesh -- mechanism only" if plat == "cpu"
                     else "real devices"),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
