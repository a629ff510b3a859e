"""Measure disparity-slab fit rates for band/tile/candidate bound policies.

Round-4 design probe for VERDICT item #1 (outlier-tolerant slab): the
round-3 finding is that per-TILE min/max dq bounds are blown by depth
edges and scattered outlier pixels (median 45-slice spread per 64x128
tile), so the slab fast path almost never engages on real optimizer
fields.  This tool replays the kernel's bound arithmetic offline (numpy)
over plane fields captured from an actual bench-size run and reports, for
several bound granularities:

  * tile     -- the shipped round-3 policy: one bound per (tile, dy)
  * band8    -- one bound per (8-row band, dy)   [sublane granularity]
  * band8+K  -- per (band, candidate) bounds     [no K union]

the fraction of bound regions that fit slab widths {8, 16, 24, 32} and
the implied executed-slice ratio vs the full-dpad contraction (the direct
predictor of tent-contraction work).

Usage:
  python tools/scratch_bandstats.py --dump   # run bench workload, save fields
  python tools/scratch_bandstats.py          # analyze saved fields
"""
import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
NPZ = os.path.join(_REPO, "tools", "_bandstats_fields.npz")

H, W, MAX_DIS = 375, 450, 60
HB = 17
TH, TW = 64, 128


def dump():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.models.pipeline import run_pair

    pair = make_pair(h=H, w=W, max_dis=MAX_DIS, seed=0)
    l, r = jnp.asarray(pair.left), jnp.asarray(pair.right)
    base = dict(max_dis=MAX_DIS, dis_scale=4, cost_method=CostMethod.GRD,
                use_cs=False, use_pp=False)
    fields = {}
    # converged field (what view-prop / late sweeps / warm starts see)
    out = run_pair(l, r, jnp.int32(0), CSPMConfig(**base))
    fields["converged"] = np.asarray(out["abc"])
    # mid-optimization field: after the rank iteration only (what the
    # first exact sweep sees after the rank->exact switch)
    cfg_rank = CSPMConfig(**base, max_iter=1, adopt_mode="rank")
    out = run_pair(l, r, jnp.int32(0), cfg_rank)
    fields["after_rank"] = np.asarray(out["abc"])
    np.savez(NPZ, **fields)
    print(f"saved {list(fields)} -> {NPZ}")


def analyze(abc: np.ndarray, label: str, dpad: int = 64):
    """abc: f32[2, H, W, 3]."""
    nv, h, w, _ = abc.shape
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]
    d_ctr = a * xs + b * ys + c                     # [2, H, W]
    ahb = np.abs(a) * HB
    n_ty, n_tx = -(-h // TH), -(-w // TW)
    # pad to tile multiples with irrelevant pixels (d=-2, zero slopes),
    # matching plane_params' padding
    hp, wp = n_ty * TH, n_tx * TW
    dpd = np.full((nv, hp, wp), -2.0, np.float32)
    bpd = np.zeros((nv, hp, wp), np.float32)
    apd = np.zeros((nv, hp, wp), np.float32)
    dpd[:, :h, :w] = d_ctr
    bpd[:, :h, :w] = b
    apd[:, :h, :w] = ahb

    dys = np.arange(-HB, HB + 1, dtype=np.float32)

    def region_stats(rh):
        """Bounds over rh-row regions; returns (fit fractions, exec ratio)
        per slab width."""
        nr = hp // rh
        # [2, n_dy, nr, n_tx] interval ends
        lo = np.full((nv, len(dys), nr * (hp // hp), n_tx), np.inf)
        # reshape into regions: [2, nr, rh, n_tx, TW]
        d_r = dpd.reshape(nv, nr, rh, n_tx, TW)
        b_r = bpd.reshape(nv, nr, rh, n_tx, TW)
        a_r = apd.reshape(nv, nr, rh, n_tx, TW)
        fits = {}
        execd = {}
        for slab in (8, 16, 24, 32):
            fits[slab] = 0
            execd[slab] = 0.0
        total = 0
        for dy in dys:
            dq = d_r + b_r * dy
            lo_px = dq - a_r
            hi_px = dq + a_r
            irr = (hi_px <= -1.0) | (lo_px >= dpad)
            lo_r = np.where(irr, np.inf, np.maximum(lo_px, -1.0)).min(
                axis=(2, 4))
            hi_r = np.where(irr, -np.inf, np.minimum(hi_px, float(dpad))
                            ).max(axis=(2, 4))
            lo2 = np.maximum(np.floor(lo_r), 0).astype(np.int64)
            hi2 = np.minimum(np.ceil(hi_r), dpad - 1).astype(np.int64)
            lo8 = (lo2 >> 3) << 3
            width = hi2 - lo8                       # fits iff < slab
            total += width.size
            for slab in fits:
                f = width < slab
                fits[slab] += int(f.sum())
                execd[slab] += float(np.where(f, slab, dpad).sum())
        out = {}
        for slab in fits:
            out[slab] = (fits[slab] / total,
                         execd[slab] / (total * dpad))
        return out

    print(f"\n== {label} (dpad={dpad}) ==")
    for rh, name in ((TH, "tile64"), (8, "band8")):
        st = region_stats(rh)
        row = "  ".join(f"s{slab}: fit {f*100:4.0f}% exec {e*100:3.0f}%"
                        for slab, (f, e) in sorted(st.items()))
        print(f"{name:7s} {row}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", action="store_true")
    args = ap.parse_args()
    if args.dump:
        dump()
        return
    data = np.load(NPZ)
    for label in data.files:
        analyze(data[label], label)


if __name__ == "__main__":
    main()
