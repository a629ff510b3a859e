"""Benchmark: stereo pairs/s/chip on the reference's canonical workload.

Workload: cones-sized pair (375x450), max_dis=60, GRD cost, 35x35 window,
plain PatchMatch (the reference README demo config, README.md:12-14) -- the
configuration BASELINE.json names for the pairs/s/chip metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference C++ implementation's estimated
single-pair wall clock on a desktop CPU for this workload.  The repository
publishes no numbers (BASELINE.md); the constant below is measured from this
repo's own from-scratch CPU oracle (csrc/) on this host once available, and
is a conservative literature-based estimate until then (PatchMatch stereo
with 35x35 adaptive-weight windows runs minutes/pair on CPUs; Bleyer et al.
report ~1 min/pair at half this disparity range on 2011 hardware).
"""

import json
import sys
import time

# Reference CPU baseline: seconds per pair on the canonical workload.
# TODO(csrc oracle): replace the estimate with the measured oracle time.
BASELINE_CPU_SECONDS_PER_PAIR = 120.0
BASELINE_SOURCE = "estimate"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
    from crossscalepatchmatch_tpu.models.pipeline import run_pair

    h, w, max_dis = 375, 450, 60
    cfg = CSPMConfig(max_dis=max_dis, dis_scale=4,
                     cost_method=CostMethod.GRD, use_cs=False, use_pp=False)
    pair = make_pair(h=h, w=w, max_dis=max_dis, seed=0)
    l = jnp.asarray(pair.left)
    r = jnp.asarray(pair.right)

    print(f"bench: {h}x{w} max_dis={max_dis} wnd={cfg.wnd_size} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    # compile + warmup
    t0 = time.perf_counter()
    out = run_pair(l, r, jnp.int32(0), cfg)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    # accuracy sanity on the synthetic scene
    disp = np.asarray(out["dis"][0], np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
    print(f"bench: compile+first-run {t_compile:.1f}s, "
          f"bad-pixel(nonocc) {bad:.3f}", file=sys.stderr)

    iters = 3
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = run_pair(l, r, jnp.int32(i), cfg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    pairs_per_s = 1.0 / dt

    vs_baseline = pairs_per_s * BASELINE_CPU_SECONDS_PER_PAIR
    print(f"bench: {dt*1e3:.0f} ms/pair", file=sys.stderr)
    print(json.dumps({
        "metric": "stereo_pairs_per_second_per_chip",
        "value": round(pairs_per_s, 4),
        "unit": f"pairs/s (375x450, max_dis=60, GRD, vs {BASELINE_SOURCE} "
                f"CPU baseline {BASELINE_CPU_SECONDS_PER_PAIR:.0f}s/pair)",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
