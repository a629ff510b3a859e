"""Fused Pallas TPU kernel for the slanted-plane ASW window cost.

This is the engine's hot path (SURVEY.md section 3.5): ~75 plane-cost
evaluations per pixel per pair, each a 35x35 adaptive-support-weight window
sum over a disparity volume with per-window-pixel linear interpolation
between slices (pre_ss_pc.cc:74-118).

Why a kernel: the jnp formulation pays a per-pixel gather
(take_along_axis along the disparity axis) per window offset, which XLA:TPU
serializes (~4 ms per offset at cones size, ~5 s per evaluation).  TPUs
have no per-lane dynamic gather usable here (Mosaic's dynamic_gather needs
full-shape lane indices), so the kernel removes the gather entirely: the
two-tap lerp at fractional disparity dq equals the dense contraction

    val(q) = sum_d vol[q, d] * max(0, 1 - |dq - d|)

which is pure VPU work.  Layout choices that make it fast:
  * the volume is stored [H, D, W]: D rides the sublane axis (padded to a
    multiple of 8), W rides the 128-wide lane axis at full utilization;
  * the image is stored [3, H, W] planes so the ASW weight's channel sum
    is three 2-D slices, not a minor-axis reduction;
  * adaptive weights w(c, q) = exp(-L1(img_c, img_q)/gamma) depend only on
    the image; since the round-4 grid restructure (one candidate per grid
    step) they are recomputed per candidate -- measured cheaper overall
    than the K-in-body layout that shared them (BASELINE.md round 4), as
    the weight math is a small fraction of the depth contraction;
  * halo'd tiles (half_wnd on every side) are DMA'd from HBM manually --
    overlapping tiles are not expressible with BlockSpec index maps -- and
    compute dwarfs the copy by ~3 orders of magnitude.

Semantics match ops.plane_cost.window_plane_cost exactly (same masking,
C-trunc, in-range test f in [1, max_dis-1], and out-of-range saturation to
max(volume)); tests/test_pallas.py checks element-level agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fly_build_image(v, oth_slab, chvol, *, dpad: int, scale: int,
                     wt: int):
    """Build the shifted-channel tile for the literal image-space-lerp
    fly path: chvol[c, :, d, :] holds other-view channel c at level-s
    column (x >> s) -+ d (left reads -d, right +d) for every tile lane x.

    No cost math happens here -- the kernel contracts these raw channel
    values with the per-pixel trunc-lerp taps (see _kernel), then applies
    the TAD data term once per window pixel, reproducing GrdPC's
    image-space sub-pixel interpolation (grd_pc.cc:149-171) instead of
    the Pre* cost-space interpolation.  Column wrap (HandleBorder) is
    baked into the slab by prepare_fly(lerp="image")'s periodic column
    extension.
    """
    step = 1 << scale
    slab_w = oth_slab.shape[2]
    left = v == 0
    for d in range(dpad):
        off = jnp.where(left, dpad - 1 - d, dpad - 1 + d) * step
        for c in range(4):
            chvol[c, :, d, :] = pltpu.roll(oth_slab[c], slab_w - off,
                                           1)[:, :wt]


def _fly_build(v, c0, img_tile, oth_slab, vol_tile, *, dpad: int,
               scale: int, mg: int, ws: int, alpha: float, tau_clr: float,
               tau_grd: float, border_thres: float, data_ch0: int = 0):
    """Build the GRD cost-volume tile in VMEM from the other view's
    channel slab -- the fused "on the fly" volume (no [H, W, D] volume
    ever exists in HBM).

    Slice d of the tile equals ops.grad_cost.grd_cost_volume semantics
    (grd_cc.cpp:7-35): TAD color (mean of 3 channel |diffs|, trunc
    tau_clr) + TAD x-gradient (trunc tau_grd) mixed by alpha, against the
    other view shifted by d columns (left view reads x - d, right view
    x + d, grd_cc.cpp:110-154), with the border pseudo-cost (compare the
    reference pixel against the constant BORDER_THRES) where x -+ d falls
    outside the image.  For scale > 0 the arrays are the level-s channels
    nearest-upsampled to the fine grid, and a level-s shift of d columns
    is a fine shift of d << s ((fx - d*2^s) >> s == (fx >> s) - d).

    oth_slab lane l holds the other view at fine global column
    c0 - mg - (dpad - 1)*step + l, so slice d of the tile (lane xl =
    fine global c0 - mg + xl) reads slab lane xl + (dpad-1 -+ d)*step.
    """
    step = 1 << scale
    rows_t, _, wt = vol_tile.shape
    slab_w = oth_slab.shape[2]
    left = v == 0
    # fine global column of tile lane xl, and its level-s coordinate
    gx = (jax.lax.broadcasted_iota(jnp.int32, (rows_t, wt), 1)
          + c0 - mg)
    gx_s = gx >> scale
    al = jnp.float32(alpha)
    be = jnp.float32(1.0 - alpha)
    inv3 = jnp.float32(1.0 / 3.0)

    # data channels start after the optional weight slab (Lab weights):
    # channels [0, 3) always feed the ASW weights, [data_ch0, data_ch0+4)
    # the (B, G, R, grad) data term
    ref = [img_tile[data_ch0 + c] for c in range(4)]
    bt = jnp.float32(border_thres)
    b_clr = (jnp.abs(ref[0] - bt) + jnp.abs(ref[1] - bt)
             + jnp.abs(ref[2] - bt)) * inv3
    b_cost = (al * jnp.minimum(b_clr, tau_clr)
              + be * jnp.minimum(jnp.abs(ref[3] - bt), tau_grd))

    # Static unroll over slices (a fori_loop over 8-slice blocks with a
    # dynamic-offset store measured >4x SLOWER to compile on the Mosaic
    # AOT helper, >18 min vs ~5 min unrolled at dpad=64 -- the dynamic
    # sublane store + stack apparently defeats its scheduling).
    sgn = jnp.where(left, 1, -1)
    for d in range(dpad):
        off = jnp.where(left, dpad - 1 - d, dpad - 1 + d) * step
        oth = [pltpu.roll(oth_slab[c], slab_w - off, 1)[:, :wt]
               for c in range(4)]
        clr = (jnp.abs(ref[0] - oth[0]) + jnp.abs(ref[1] - oth[1])
               + jnp.abs(ref[2] - oth[2])) * inv3
        cost = (al * jnp.minimum(clr, tau_clr)
                + be * jnp.minimum(jnp.abs(ref[3] - oth[3]), tau_grd))
        # in-range test without a select on i1 vectors (Mosaic cannot
        # legalize those): left needs gx_s >= d, right gx_s <= ws-1-d;
        # both are sgn*gx_s >= bound with per-view scalars.
        bound = jnp.where(left, d, -(ws - 1 - d))
        in_rng = gx_s * sgn >= bound
        vol_tile[:, d, :] = jnp.where(in_rng, cost, b_cost)


def _kernel(maxc_ref, yb_ref, img_hbm, vol_hbm, abc_ref, out_ref,
            *scratch,
            hb: int, wnd: int, th: int, tw: int, dpad: int,
            max_dis: int, gamma: float, k: int,
            scale: int = 0, ws: int = 0,
            wstride: int = 1,
            fly: dict | None = None,
            ablate: frozenset = frozenset(),
            wgt_hoist: bool = False):
    """One (view, tile_y, tile_x, candidate, dy) grid step.

    img_hbm: f32[2, 3, Hp, Wp] HBM   (padded by mg = hb << scale on every
      side of H, W; for scale > 0 the arrays are the pyramid level
      nearest-upsampled to the fine grid, see prepare_volumes)
    vol_hbm: f32[2, Hp, dpad, Wp] HBM
    abc_ref: f32[1, K, 4, th, tw] VMEM block -- (d_center, a, b, pad),
      d_center on the FINE grid (divided by 2^scale in here)
    maxc_ref: f32[2] SMEM scalar-prefetch -- per-view saturation values
    yb_ref: i32[4] SMEM scalar-prefetch -- [ylo, yhi, xlo, xhi) local
      row/column validity bounds.  (0, hs<<s, 0, ws<<s) for a standalone
      image; a spatially-sharded caller passes its block's global-border
      clip so neighbor-halo rows/columns count as valid image pixels
      (parallel.tiled) while pixels past the global image border do not.
      For scale > 0 the interval encodes ((p + off) >> s) < n_s as the
      fine-coordinate interval [-off, (n_s << s) - off).
    out_ref: f32[1, 1, th, tw] VMEM block (the current candidate's)

    Grid layout (round 4).  The window row offset dy and the candidate
    index kk ride the GRID instead of the kernel body:

      grid = (view, tile_y, tile_x, kk, dy)

    so one grid step evaluates ONE candidate's ONE window row over the
    tile.  Consequences, all measured/structural:
      * the compiled body is K-independent and holds a single dy step --
        small Mosaic compile units (cold compile ~2x faster than the
        round-3 K-in-body forms), and the dx loop is always the
        statically-unrolled form (the K >= 2 register-spill tradeoff that
        needed a fori fallback no longer exists);
      * tile DMAs run on the tile's first step only; VMEM scratch and the
        per-candidate output block persist across the inner grid dims
        (the output block index is constant over dy and never revisited
        after its kk retires).

    Scratch:
      img_tile: f32[n_ch, th+2mg, WT] raw halo'd tile rows,
        WT = roundup(tw+2mg, 128)
      vol_tile: f32[th+2mg, dpad, WT]
      img_rot:  f32[3, th+2mg, WT] -- rows rotated by mg+sy for the
        current dy (tpu.dynamic_rotate takes a traced shift; a dynamic
        memref slice at the arbitrary offset mg+sy would not be legal),
        rebuilt on each (kk, dy) step

    Cross-scale (scale > 0) semantics follow
    ops.plane_cost.window_plane_cost_upsampled (pre_cs_pc.cc:133-188): the
    window is wnd x wnd in *level-s* pixels, i.e. strides of 2^scale on the
    upsampled fine-grid arrays; the hypothesis disparity at the window pixel
    is d_center/2^s + a*dx + b*dy (coarse-unit offsets); a window pixel is
    valid iff its fine coordinate maps to a real level-s pixel
    ((fy >> s) < hs etc.); max_dis is the level-s disparity bound.

    The contraction always runs over all dpad slices.  THREE data-sparse
    alternatives were built, measured SLOWER on v5e hardware, and removed
    (measurements in BASELINE.md; implementations in git history):
      * a log-depth select-tree gather of the exact two taps (round 1-3);
      * a slope-sheared disparity slab (round 3);
      * a dynamically-sliced disparity slab with per-tile, then
        per-(candidate, 8-row band) min/max dq bounds (rounds 1-4): real
        optimizer fields keep scattered outlier pixels and depth edges
        that blow the interval at every granularity (band8 fit rates:
        37% converged, 2% mid-optimization), while the bound + dual-path
        machinery taxed every launch -- removing it measured faster on
        every workload (bench 1477 -> 1200 ms/pair, KITTI 8.2 -> 7.7 s,
        CS+PP 3.3 -> 2.8 s, warm frame 983 -> 673 ms).
    """
    img_tile, vol_tile, img_rot, sems = scratch[:4]
    oth_slab = scratch[4] if fly is not None else None
    image_lerp = fly is not None and fly.get("lerp", "cost") == "image"
    # `ablate` (volume path only; outputs are GARBAGE when non-empty) is
    # the cycle-attribution hook for tools/scratch_cycle.py: knocking a
    # named component out of the real kernel and timing the difference
    # attributes the launch instruction-by-instruction (VERDICT round-4
    # item 2) without maintaining a drifting standalone copy.  Members:
    # "body" (DMA + grid only), "rot" (sublane rotate -> copy), "wgt"
    # (ASW weight -> validity mask), "exp" (exp -> multiply), "tent"
    # (tent build+mul dropped; vol read + depth sum kept), "mac" (all
    # depth-wide work dropped), "slice" (unaligned lane slices -> offset
    # 0).
    assert not ablate or (fly is None and not image_lerp)

    step = 1 << scale
    mg = hb * step        # fine-grid margin baked into the padded arrays
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    kk = pl.program_id(3)
    dyi = pl.program_id(4)
    r0 = ti * th          # padded-array row of the tile's first halo row
    c0 = tj * tw

    rows_t = img_tile.shape[1]       # roundup(th + 2mg, 8)
    wt = img_tile.shape[2]           # roundup(tw + 2mg, 128)
    inv_step = jnp.float32(1.0 / step)

    o_start = -hb
    dy = dyi * wstride + o_start
    sy = dy * step

    @pl.when((kk == 0) & (dyi == 0))
    def _setup():
        # DMA slab sizes are rounded up to the (8, 128) memref tiling; the
        # extra rows/lanes are never read by the compute below.
        cp_img = pltpu.make_async_copy(
            img_hbm.at[v, :, pl.ds(r0, rows_t), pl.ds(c0, wt)],
            img_tile, sems.at[0])
        if fly is None:
            cp_vol = pltpu.make_async_copy(
                vol_hbm.at[v, pl.ds(r0, rows_t), :, pl.ds(c0, wt)],
                vol_tile, sems.at[1])
        else:
            # vol_hbm is the other view's channel array (lane-extended);
            # the cost-volume tile is built in VMEM from it (_fly_build)
            cp_vol = pltpu.make_async_copy(
                vol_hbm.at[v, :, pl.ds(r0, rows_t),
                           pl.ds(c0, oth_slab.shape[2])],
                oth_slab, sems.at[1])
        cp_img.start()
        cp_vol.start()
        cp_img.wait()
        cp_vol.wait()
        if fly is not None:
            if image_lerp:
                _fly_build_image(v, oth_slab, vol_tile, dpad=dpad,
                                 scale=scale, wt=wt)
            else:
                _fly_build(v, c0, img_tile, oth_slab, vol_tile, dpad=dpad,
                           scale=scale, mg=mg, ws=ws,
                           **{k_: v_ for k_, v_ in fly.items()
                              if k_ != "lerp"})

    dc0 = 0 if fly is None else fly.get("data_ch0", 0)

    @pl.when(dyi == 0)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    if "body" in ablate:
        return

    # Image rows at a traced sublane offset: Mosaic rejects dynamic memref
    # slices on a TILED dim unless the index is provably a multiple of the
    # (8,128) tiling -- and mg + sy is an arbitrary integer.
    # tpu.dynamic_rotate DOES support a traced shift on the sublane axis,
    # so roll the rows down by mg + sy once per (kk, dy) step.
    # (The literal image-lerp fly mode also rotates the gradient channel:
    # its data term reads the window pixel's own gradient.)
    if "rot" in ablate:
        img_rot[...] = img_tile[0:img_rot.shape[0]]
    else:
        img_rot[...] = pltpu.roll(img_tile[0:img_rot.shape[0]],
                                  rows_t - (mg + sy), 1)

    # This candidate's plane params over the tile's center pixels.
    p0 = abc_ref[0, kk, 0]
    pa = abc_ref[0, kk, 1]
    pb = abc_ref[0, kk, 2]
    if scale > 0:
        p0 = p0 * inv_step

    # Global (unpadded) FINE-grid coordinates of the tile's center pixels.
    ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + r0
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + c0
    maxc = maxc_ref[v]
    inv_gamma = jnp.float32(1.0 / gamma)
    dyf = dy.astype(jnp.float32)       # dy is traced (grid-derived)

    ctr = [img_tile[p, mg:mg + th, mg:mg + tw] for p in range(3)]
    q_rows = [img_rot[p, 0:th, :] for p in range(3)]
    # Lab-weight fly layout (data_ch0 > 0): channels [0, 3) feed the ASW
    # weights, [dc0, dc0+4) the BGR+grad data term; without it the
    # weight and data channels coincide and qd_rows aliases q_rows.
    # Only the image-lerp branch reads window-pixel DATA channels (cost
    # mode's data lives in vol_tile), and only then does img_rot carry
    # them.
    qd_rows = (q_rows if dc0 == 0 or not image_lerp
               else [img_rot[dc0 + p, 0:th, :] for p in range(3)])

    fy = ys + sy
    # For scale > 0 the caller encodes ((fy + row0) >> s) < hs as the
    # local fine-row interval [ylo, yhi) = [-row0, (hs << s) - row0):
    # for integer fy >= ylo the two are equivalent.
    y_ok = (fy >= yb_ref[0]) & (fy < yb_ref[1])

    n_dx = len(range(o_start, hb + 1, wstride))

    # Accumulate all dx offsets with the dense tent contraction
    # sum_d vol*max(0, 1-|dq-d|) over the dpad slices (or, for the
    # literal image-lerp fly mode, a trunc-derived 2-delta contraction
    # over shifted channel slices -- see the branch below).
    #
    # The dx offsets are a static unroll: a static unaligned lane slice
    # lowers to ONE shift stage per vreg, where a dynamic lane-rotate
    # costs log2(lanes) select-shift stages (measured 107 ms of a 168 ms
    # K=1 launch at dpad=64, round 3).  wstride > 1 evaluates a
    # subsampled window (candidate prescreening); the strided grid starts
    # at -hb, matching ops.plane_cost.stride_start.
    if image_lerp:
        chv_b = vol_tile[:, pl.ds(mg + sy, th), :, :]
        al = jnp.float32(fly["alpha"])
        be = jnp.float32(1.0 - fly["alpha"])
        t_clr = jnp.float32(fly["tau_clr"])
        t_grd = jnp.float32(fly["tau_grd"])
        inv3 = jnp.float32(1.0 / 3.0)
        wsgn = jnp.where(v == 0, jnp.float32(-1.0), jnp.float32(1.0))
    else:
        vol_b = vol_tile[pl.ds(mg + sy, th), :, :]
    d_io = jax.lax.broadcasted_iota(
        jnp.int32, (th, dpad, tw), 1).astype(jnp.float32)
    def dx_parts(dxi):
        dx = dxi * wstride + o_start
        off = 0 if "slice" in ablate else (dx + hb) * step  # static lanes
        q = [q_rows[p][:, off:off + tw] for p in range(3)]
        # window pixel must map to a real (level-s) image pixel
        fx = xs + dx * step
        q_ok = y_ok & (fx >= yb_ref[2]) & (fx < yb_ref[3])
        if "wgt" in ablate:
            wgt = jnp.where(q_ok, 1.0, 0.0)
        else:
            l1 = (jnp.abs(ctr[0] - q[0]) + jnp.abs(ctr[1] - q[1])
                  + jnp.abs(ctr[2] - q[2]))
            wgt = jnp.where(q_ok,
                            l1 * inv_gamma if "exp" in ablate
                            else jnp.exp(-l1 * inv_gamma), 0.0)
        return dx, off, fx, q, wgt

    # wgt_hoist: compute every dx offset's ASW weight plane BEFORE the
    # depth-contraction loop -- identical math and accumulation order,
    # bitwise-same output, but Mosaic schedules the low-ILP weight
    # chain apart from the VMEM-heavy contraction.  Measured round 5 at
    # bench shape: K=1 full-window 72.3 -> 66.9 ms/launch (-7.5%; the
    # attribution showed the interleaved weight phase at ~0.27 Tops/s,
    # 12x under the ALU ceiling), but K=2 +2.4% and strided prescreen
    # launches neutral -- so _invoke's auto policy hoists K=1 only.
    pre = ([dx_parts(i) for i in range(n_dx)]
           if wgt_hoist and not image_lerp else None)
    for dxi in range(n_dx):
        dx, off, fx, q, wgt = pre[dxi] if pre is not None else dx_parts(dxi)
        dq = p0 + pa * jnp.float32(dx) + pb * dyf
        f = jnp.trunc(dq)
        in_range = (f >= 1.0) & (f <= jnp.float32(max_dis - 1))
        if image_lerp:
            # Literal GrdPC/CSPC data term (grd_pc.cc:149-171): warp the
            # other view's channels to the sub-pixel correspondence
            # other_x = (q_x >> s) -+ dq with the reference's C-trunc
            # lerp -- trunc toward zero, NOT floor, reproduced exactly,
            # including the extrapolating weights it yields at negative
            # other_x -- then apply the TAD term once per window pixel.
            # The two taps are a 2-delta contraction over the
            # shifted-channel slices (the same dense-contraction trick
            # as the tent, with trunc-derived tap indices); HandleBorder
            # column wrap is baked into the slab by prepare_fly's
            # periodic extension.
            qxs = (fx >> scale).astype(jnp.float32)
            other_x = qxs + wsgn * dq
            ox_t = jnp.trunc(other_x)
            fl_w = ox_t + 1.0 - other_x
            d1 = (wsgn * (ox_t - qxs))[:, None, :]
            fwb = fl_w[:, None, :]
            taps = (jnp.where(d_io == d1, fwb, 0.0)
                    + jnp.where(d_io == d1 + wsgn, 1.0 - fwb, 0.0))
            warp = [jnp.sum(chv_b[c, :, :, off:off + tw] * taps, axis=1)
                    for c in range(4)]
            qd = (q if dc0 == 0
                  else [qd_rows[p][:, off:off + tw] for p in range(3)])
            qg = img_rot[dc0 + 3, 0:th, off:off + tw]
            clr = (jnp.abs(qd[0] - warp[0]) + jnp.abs(qd[1] - warp[1])
                   + jnp.abs(qd[2] - warp[2])) * inv3
            val = (al * jnp.minimum(clr, t_clr)
                   + be * jnp.minimum(jnp.abs(qg - warp[3]), t_grd))
        else:
            # Dense tent contraction over the dpad cost slices -- equal
            # to the Pre* cost-space two-tap lerp at fractional dq
            # (pre_ss_pc.cc:99-111) because the tent has mass only at
            # floor(dq)/ceil(dq).
            if "mac" in ablate:
                val = dq
            else:
                vol_q = vol_b[:, :, off:off + tw]
                if "tent" in ablate:
                    val = jnp.sum(vol_q, axis=1)
                else:
                    tent = jnp.maximum(0.0,
                                       1.0 - jnp.abs(dq[:, None, :] - d_io))
                    val = jnp.sum(vol_q * tent, axis=1)
        val = jnp.where(in_range, val, maxc)
        out_ref[0, 0] += wgt * val


class PreparedVolumes:
    """Kernel-layout views of the per-view image + volume data.

    Built ONCE per stereo pair (the transpose/pad of the 2 x H x W x D
    volume is ~100 MB of HBM traffic -- it must not be repaid on each of
    the ~79 cost evaluations of a PatchMatch run).
    """

    def __init__(self, img_p, vol_p, h, w, d, scale=0, hs=None, ws=None):
        self.img_p = img_p    # f32[2, 3, Hp, Wp]
        self.vol_p = vol_p    # f32[2, Hp, dpad, Wp]
        self.h, self.w, self.d = h, w, d
        self.scale = scale    # pyramid level the arrays were upsampled from
        self.hs = h if hs is None else hs    # level-s image height
        self.ws = w if ws is None else ws


jax.tree_util.register_pytree_node(
    PreparedVolumes,
    lambda p: ((p.img_p, p.vol_p), (p.h, p.w, p.d, p.scale, p.hs, p.ws)),
    lambda aux, ch: PreparedVolumes(*ch, *aux))


def prepare_volumes(imgs_u8: jax.Array, vols: jax.Array, *, half_wnd: int,
                    th: int = 64, tw: int = 128, scale: int = 0,
                    fine_hw: tuple | None = None,
                    rows_extended: bool = False,
                    cols_extended: bool = False,
                    row0: jax.Array | int = 0,
                    col0: jax.Array | int = 0,
                    vol_dtype=jnp.float32) -> PreparedVolumes:
    """Lay out images/volumes for the kernel (pad + D-to-sublane transpose).

    For scale > 0 the level-s arrays are nearest-upsampled to the fine grid
    with an hb*2^s margin on every side (the kernel-layout analogue of
    ops.plane_cost.upsample_level): padded position (mg + fy, mg + fx)
    holds level value (fy >> s, fx >> s), edge-clamped in the margins
    (margin values only feed masked lanes).

    Args:
      imgs_u8: u8[2, Hs, Ws, 3] per-view level-s reference images.
      vols: f32[2, Hs, Ws, Ds] per-view level-s cost volumes.
      scale: pyramid level s (arrays are at level-s resolution).
      fine_hw: level-0 (H, W); defaults to the input shape (scale 0).
      rows_extended / cols_extended: the input rows/columns already carry
        a half_wnd halo on each side (a spatially-sharded caller's
        ppermute-extended block); only valid with scale 0.
      row0 / col0: global fine row/column of the first output row/column
        (scale > 0 only) -- a spatially-sharded caller passes its block
        offset so the upsampled slices of the replicated level-s arrays
        cover the block.  May be traced (inside shard_map).
      vol_dtype: storage dtype of the kernel-layout volume (f32 default,
        bf16 halves the HBM volume and the kernel's dominant VMEM slab
        reads; the tent contraction accumulates in f32 either way --
        only the slice VALUES round to 8-bit mantissa.  See
        config.CSPMConfig.vol_dtype for the measured accuracy bound).
    """
    nv, hs, ws, _ = imgs_u8.shape
    d = vols.shape[-1]
    if rows_extended or cols_extended:
        assert scale == 0 and fine_hw is None
        if rows_extended:
            hs -= 2 * half_wnd
        if cols_extended:
            ws -= 2 * half_wnd
    h, w = fine_hw if fine_hw is not None else (hs, ws)
    step = 1 << scale
    mg = half_wnd * step
    # bf16 memrefs tile (16, 128) on the trailing (dpad, W) dims
    dpad = _round_up(d, 16 if vol_dtype == jnp.bfloat16 else 8)
    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * mg, 8)
    wt_pad = _round_up(tw + 2 * mg, 128)
    hp = (n_ty - 1) * th + rows_t
    wp = (n_tx - 1) * tw + wt_pad

    img_f = jnp.moveaxis(imgs_u8.astype(jnp.float32), -1, 1)  # [2,3,Hs,Ws]
    vol_t = jnp.moveaxis(vols.astype(vol_dtype), -1, 2)       # [2,Hs,D,Ws]
    vol_t = jnp.pad(vol_t, ((0, 0), (0, 0), (0, dpad - d), (0, 0)))
    if scale == 0:
        # a pre-extended axis already carries its mg halo (sharded caller):
        # add only the far-side tile round-up there
        rpad = (0, hp - h - 2 * mg) if rows_extended else (mg, hp - h - mg)
        cpad = (0, wp - w - 2 * mg) if cols_extended else (mg, wp - w - mg)
        img_p = jnp.pad(img_f, ((0, 0), (0, 0), rpad, cpad))
        vol_p = jnp.pad(vol_t, ((0, 0), rpad, (0, 0), cpad))
    else:
        ry = jnp.clip((jnp.arange(hp) - mg + row0) >> scale, 0, hs - 1)
        rx = jnp.clip((jnp.arange(wp) - mg + col0) >> scale, 0, ws - 1)
        img_p = jnp.take(jnp.take(img_f, ry, axis=2), rx, axis=3)
        vol_p = jnp.take(jnp.take(vol_t, ry, axis=1), rx, axis=3)
    return PreparedVolumes(img_p, vol_p, h, w, d, scale, hs, ws)


class PreparedFly:
    """Kernel-layout views for the fused on-the-fly GRD cost path.

    No [H, W, D] cost volume exists anywhere: the kernel builds each
    tile's volume in VMEM from these per-view channel arrays
    (_fly_build).  HBM footprint is O(H * W) instead of O(H * W * D) --
    the TPU-native answer to the reference's on-the-fly GrdPC family
    (plane_cost/grd_pc.cc), whose point is exactly to avoid volume
    storage.

    img_p: f32[2, 4, Hp, Wp]   reference-view channels (B, G, R, x-grad
      of BT.601 gray) padded like PreparedVolumes.img_p.  With Lab ASW
      weights (grd_pc.h:25 capability) a 3-channel weight slab is
      PREFIXED: [L, a, b, B, G, R, grad] and data_ch0 = 3 -- the second
      weight-channel slab DMA that closes the use_lab_weights gap on the
      no-volume kernel (VERDICT round-4 item 5).
    oth_p: f32[2, 4, Hp, ExtW] other-view DATA channels (weights only
      ever read the reference view), lane-extended so a
      tile at column c0 can DMA one contiguous slab covering every
      shifted read x -+ d (d in [0, dpad)): ext lane e holds fine global
      column e - E with E = (dpad - 1) * 2^scale + mg, zeros outside the
      image (always masked: border pseudo-cost inside the image width,
      q-validity bounds outside).
    """

    def __init__(self, img_p, oth_p, h, w, d, scale=0, hs=None, ws=None,
                 slab_w=0, lerp="cost", data_ch0=0):
        self.img_p = img_p
        self.oth_p = oth_p
        self.h, self.w, self.d = h, w, d
        self.scale = scale
        self.hs = h if hs is None else hs
        self.ws = w if ws is None else ws
        self.slab_w = slab_w
        self.lerp = lerp
        self.data_ch0 = data_ch0


jax.tree_util.register_pytree_node(
    PreparedFly,
    lambda p: ((p.img_p, p.oth_p),
               (p.h, p.w, p.d, p.scale, p.hs, p.ws, p.slab_w, p.lerp,
                p.data_ch0)),
    lambda aux, ch: PreparedFly(*ch, *aux))


def prepare_fly(imgs_u8: jax.Array, *, half_wnd: int, max_dis: int,
                th: int = 64, tw: int = 128, scale: int = 0,
                fine_hw: tuple | None = None,
                lerp: str = "cost",
                wgt_imgs_u8: jax.Array | None = None) -> PreparedFly:
    """Lay out per-view channel planes for the fused on-the-fly kernel.

    Args:
      imgs_u8: u8[2, Hs, Ws, 3] level-s BGR views (level-s of the
        pyramid for scale > 0).
      max_dis: the LEVEL-s disparity bound; the virtual volume has
        max_dis + 1 slices (grd_cost_volume convention).

    The channel stack per view is (B, G, R, x-gradient of float gray)
    -- the color TAD is channel-permutation invariant so BGR order is
    fine, and the gradient is computed at level-s resolution before any
    upsampling (grd_cc.cpp:70-77 computes it on the level image).

    lerp selects the kernel's sub-pixel mode the layout serves:
      * "cost" (production): the kernel builds GRD cost slices in VMEM
        and lerps in COST space like the Pre* classes; out-of-image
        shifted reads take the border pseudo-cost, so the other-view
        extension is zero-filled.
      * "image": the literal GrdPC/CSPC semantics -- the kernel lerps
        the other view's CHANNELS at the sub-pixel warp; columns wrap
        like HandleBorder (commfunc.h:129-145, applied to each tap in
        grd_pc.cc:153-154), so the extension is PERIODIC over the
        level-s width (mod covers every wrap the in-range disparity
        test admits).

    wgt_imgs_u8: optional u8[2, Hs, Ws, 3] per-view WEIGHT images (the
      level-s Lab conversions for use_lab_weights, grd_pc.cc:31-35);
      prefixed as channels [0, 3) so the kernel's ASW weights read them
      while the data term reads the BGR+grad channels at data_ch0 = 3.
    """
    from ..color import bgr_to_rgb, rgb_to_gray_f32
    from ..gradient import sobel_x_k1

    nv, hs, ws, _ = imgs_u8.shape
    h, w = fine_hw if fine_hw is not None else (hs, ws)
    d = max_dis + 1
    step = 1 << scale
    mg = half_wnd * step
    dpad = _round_up(d, 8)
    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * mg, 8)
    wt_pad = _round_up(tw + 2 * mg, 128)
    hp = (n_ty - 1) * th + rows_t
    wp = (n_tx - 1) * tw + wt_pad
    slab_w = _round_up(wt_pad + 2 * (dpad - 1) * step, 128)
    ext_w = (n_tx - 1) * tw + slab_w
    ext = (dpad - 1) * step + mg

    img_f = jnp.moveaxis(imgs_u8.astype(jnp.float32), -1, 1)  # [2,3,Hs,Ws]
    grd = sobel_x_k1(rgb_to_gray_f32(bgr_to_rgb(imgs_u8)))    # [2,Hs,Ws]
    data = jnp.concatenate([img_f, grd[:, None]], axis=1)     # [2,4,Hs,Ws]
    if wgt_imgs_u8 is None:
        ch, data_ch0 = data, 0
    else:
        wgt_f = jnp.moveaxis(wgt_imgs_u8.astype(jnp.float32), -1, 1)
        ch = jnp.concatenate([wgt_f, data], axis=1)           # [2,7,Hs,Ws]
        data_ch0 = 3
    oth = data[::-1]          # view 0 reads the right image and vice versa

    if scale == 0:
        img_p = jnp.pad(ch, ((0, 0), (0, 0), (mg, hp - h - mg),
                             (mg, wp - w - mg)))
        if lerp == "image":
            oth_r = jnp.pad(oth, ((0, 0), (0, 0), (mg, hp - h - mg),
                                  (0, 0)))
            oth_p = jnp.take(oth_r, (jnp.arange(ext_w) - ext) % w, axis=3)
        else:
            oth_p = jnp.pad(oth, ((0, 0), (0, 0), (mg, hp - h - mg),
                                  (ext, ext_w - w - ext)))
    else:
        ry = jnp.clip((jnp.arange(hp) - mg) >> scale, 0, hs - 1)
        rx = jnp.clip((jnp.arange(wp) - mg) >> scale, 0, ws - 1)
        img_p = jnp.take(jnp.take(ch, ry, axis=2), rx, axis=3)
        # ext lane e -> fine global column e - ext -> level (e-ext) >> s;
        # cost mode: out-of-image values are never read unmasked (class
        # doc); image mode: periodic over the level width (HandleBorder)
        if lerp == "image":
            re = ((jnp.arange(ext_w) - ext) >> scale) % ws
        else:
            re = jnp.clip((jnp.arange(ext_w) - ext) >> scale, 0, ws - 1)
        oth_p = jnp.take(jnp.take(oth, ry, axis=2), re, axis=3)
    return PreparedFly(img_p, oth_p, h, w, d, scale, hs, ws, slab_w, lerp,
                       data_ch0)


def plane_params(abc: jax.Array, *, th: int = 64,
                 tw: int = 128) -> jax.Array:
    """Kernel-input plane parameters (d_center, a, b, 0), tile-padded.

    abc: f32[2, K, H, W, 3] -> f32[2, K, 4, TH, TW]; d_center is the plane
    disparity at the pixel's own fine-grid coordinates.  Computed once per
    candidate batch and shared across pyramid scales.
    """
    h, w = abc.shape[-3], abc.shape[-2]
    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_center = abc[..., 0] * xs + abc[..., 1] * ys + abc[..., 2]
    pad = ((0, 0), (0, 0), (0, n_ty * th - h), (0, n_tx * tw - w))
    # Padded (out-of-image) tile pixels get d_center = -2 with zero slopes:
    # always out of range (saturated), and their cost outputs are sliced
    # away by the caller regardless.
    params = jnp.stack([jnp.pad(d_center, pad, constant_values=-2.0),
                        jnp.pad(abc[..., 0], pad),
                        jnp.pad(abc[..., 1], pad),
                        jnp.pad(jnp.zeros_like(d_center), pad)],
                       axis=2)                              # [2, K, 4, TH, TW]
    return params


def _invoke(prep, max_costs: jax.Array, params: jax.Array,
            *, half_wnd: int, max_dis_s: int, gamma: float, th: int,
            tw: int, wnd_stride: int = 1,
            ybounds: jax.Array | None = None,
            fly_params: dict | None = None,
            ablate: frozenset = frozenset(),
            wgt_hoist: bool | None = None) -> jax.Array:
    """Run the kernel for one (possibly upsampled) pyramid level.

    prep: PreparedVolumes (fly_params None) or PreparedFly (fly_params =
    dict(alpha, tau_clr, tau_grd, border_thres) -- the tile volume is
    then built in VMEM by _fly_build).

    The grid carries (candidate, dy) -- see _kernel.
    """
    h, w, d = prep.h, prep.w, prep.d
    img_p = prep.img_p
    vol_p = prep.oth_p if fly_params is not None else prep.vol_p
    nv = img_p.shape[0]
    k = params.shape[1]
    hb = half_wnd
    wnd = 2 * hb + 1
    mg = hb << prep.scale
    # volume path: depth padding and storage dtype come from the
    # prepared layout (prepare_volumes vol_dtype); fly tiles are built
    # in VMEM and stay f32
    vol_dt = vol_p.dtype if fly_params is None else jnp.float32
    dpad = (vol_p.shape[2] if fly_params is None else _round_up(d, 8))

    n_ty = -(-h // th)
    n_tx = -(-w // tw)
    rows_t = _round_up(th + 2 * mg, 8)
    wt_pad = _round_up(tw + 2 * mg, 128)

    maxc = max_costs.astype(jnp.float32)
    if ybounds is None:
        # standalone image: pixels valid while they map to a real level-s
        # pixel, i.e. rows [0, hs << s) x cols [0, ws << s) (at scale 0
        # this is [0, h) x [0, w))
        ybounds = jnp.array([0, prep.hs << prep.scale,
                             0, prep.ws << prep.scale], jnp.int32)

    if wgt_hoist is None:
        # auto policy: hoisting the weight planes ahead of the depth
        # contraction wins only on K=1 full-window launches (round-5
        # A/B: K=1 -7.5%, K=2 +2.4%, strided prescreen neutral)
        wgt_hoist = k == 1 and wnd_stride == 1
    kern = functools.partial(
        _kernel, hb=hb, wnd=wnd, th=th, tw=tw, dpad=dpad,
        max_dis=max_dis_s, gamma=gamma, k=k,
        scale=prep.scale, ws=prep.ws, wstride=wnd_stride,
        fly=fly_params, ablate=ablate, wgt_hoist=wgt_hoist)

    # fly tiles carry (B, G, R, grad), plus a 3-channel Lab weight slab
    # prefix when data_ch0 > 0 (prepare_fly wgt_imgs_u8)
    n_ch = 3 if fly_params is None else img_p.shape[1]
    image_lerp = (fly_params is not None
                  and fly_params.get("lerp", "cost") == "image")
    # image-lerp mode contracts 4 shifted CHANNEL volumes instead of one
    # cost volume, and its data term reads the window pixel's own
    # channels + gradient, so the rotated-rows scratch carries them all
    vol_shape = ((4, rows_t, dpad, wt_pad) if image_lerp
                 else (rows_t, dpad, wt_pad))
    scratch = [
        pltpu.VMEM((n_ch, rows_t, wt_pad), jnp.float32),
        pltpu.VMEM(vol_shape, vol_dt),
        pltpu.VMEM((n_ch if image_lerp else 3, rows_t, wt_pad),
                   jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    if fly_params is not None:
        scratch.append(pltpu.VMEM((4, rows_t, prep.slab_w), jnp.float32))

    n_dy = len(range(-hb, hb + 1, wnd_stride))
    grid = (nv, n_ty, n_tx, k, n_dy)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, 4, th, tw),
                         lambda v, i, j, *_: (v, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th, tw),
                               lambda v, i, j, kk, *_: (v, kk, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((nv, k, n_ty * th, n_tx * tw),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(nv * k * n_ty * th * n_tx * tw * wnd * wnd
                   * (dpad * (10 if image_lerp else 3) + 12)),
            bytes_accessed=(vol_p.size * vol_p.dtype.itemsize
                            + img_p.size * 4),
            transcendentals=nv * n_ty * th * n_tx * tw * wnd * wnd,
        ),
    )(maxc, ybounds.astype(jnp.int32), img_p, vol_p, params)
    return out[:, :, :h, :w]


def window_plane_cost_prepared(prep: PreparedVolumes, max_costs: jax.Array,
                               abc: jax.Array, *, half_wnd: int,
                               max_dis: int, gamma: float, th: int = 64,
                               tw: int = 128,
                               wnd_stride: int = 1,
                               ybounds: jax.Array | None = None,
                               _ablate: frozenset = frozenset(),
                               _wgt_hoist: bool | None = None) -> jax.Array:
    """Fused window plane cost over pre-laid-out volumes.

    Args:
      prep: prepare_volumes output (same half_wnd/th/tw).
      max_costs: f32[2] per-view saturation values.
      abc: f32[2, K, H, W, 3] candidate plane fields.
      ybounds: optional i32[2] local-row validity interval for spatially
        sharded bands (see _kernel); defaults to [0, H).
      _ablate: attribution-only component knockouts (see _kernel; output
        is garbage when non-empty -- tools/scratch_cycle.py only).

    Returns:
      f32[2, K, H, W] aggregated window costs (identical semantics to
      ops.plane_cost.window_plane_cost vmapped over views).
    """
    params = plane_params(abc, th=th, tw=tw)
    return _invoke(prep, max_costs, params, half_wnd=half_wnd,
                   max_dis_s=max_dis, gamma=gamma, th=th, tw=tw,
                   wnd_stride=wnd_stride, ybounds=ybounds, ablate=_ablate,
                   wgt_hoist=_wgt_hoist)


def fly_sat_cost(alpha: float, tau_clr: float, tau_grd: float) -> float:
    """Out-of-range saturation for the fly path: the analytic volume
    maximum alpha*tau_clr + (1-alpha)*tau_grd.  This is GrdPC's own
    saturation constant (grd_pc.cc:118-123) and the supremum of every
    GRD volume entry (both TAD terms are truncated); the Pre* classes
    instead use max(volume) (pre_ss_pc.cc:39), which equals this bound
    whenever any pixel attains both truncations -- i.e. on any natural
    image.  The fly path has no volume to take a max over, so it uses
    the bound."""
    return alpha * tau_clr + (1.0 - alpha) * tau_grd


def fly_plane_cost_prepared(prep: PreparedFly, abc: jax.Array, *,
                            half_wnd: int, max_dis: int, gamma: float,
                            alpha: float = 0.1, tau_clr: float = 10.0,
                            tau_grd: float = 2.0,
                            border_thres: float = 3.0, th: int = 64,
                            tw: int = 128,
                            wnd_stride: int = 1) -> jax.Array:
    """Fused on-the-fly GRD window plane cost (no HBM cost volume).

    With prep.lerp == "cost" (production): same window/ASW/lerp semantics
    as window_plane_cost_prepared over the GRD volume that
    grd_cost_volume would build (element-exact up to the saturation
    constant, see fly_sat_cost); the volume never exists -- each tile's
    slices are built in VMEM from the other view's channels.

    With prep.lerp == "image": the literal GrdPC semantics
    (grd_pc.cc:71-178) -- sub-pixel interpolation happens in IMAGE space
    (C-trunc taps, HandleBorder column wrap, no border pseudo-cost),
    element-exact vs ops.onthefly_cost.grd_fly_cost.  ~dpad extra
    channel contractions per window pixel make it slower than cost mode;
    it exists so the reference's query-time cost family runs on TPU with
    its exact sub-pixel semantics, not just the Pre*-style ones.

    Args:
      prep: prepare_fly output (same half_wnd/max_dis/th/tw).
      abc: f32[2, K, H, W, 3] candidate plane fields.

    Returns:
      f32[2, K, H, W].
    """
    params = plane_params(abc, th=th, tw=tw)
    sat = jnp.float32(fly_sat_cost(alpha, tau_clr, tau_grd))
    maxc = jnp.stack([sat, sat])
    fp = dict(alpha=alpha, tau_clr=tau_clr, tau_grd=tau_grd,
              border_thres=border_thres, lerp=prep.lerp,
              data_ch0=prep.data_ch0)
    return _invoke(prep, maxc, params, half_wnd=half_wnd,
                   max_dis_s=max_dis, gamma=gamma, th=th, tw=tw,
                   wnd_stride=wnd_stride, fly_params=fp)


def prepare_cross_scale_fly(vd_imgs, *, half_wnd: int, max_dis: int,
                            th: int = 64, tw: int = 128,
                            lerp: str = "cost", vd_wgt_imgs=None):
    """prepare_fly for every pyramid level (level-s disparity bound
    max_dis // 2^s, pre_cs_pc.cc per-level volumes).  vd_wgt_imgs
    optionally carries per-level weight images (Lab, cspc.cc:48-49)."""
    fine_hw = vd_imgs[0].shape[1:3]
    preps = []
    md = max_dis
    for s, img_s in enumerate(vd_imgs):
        wgt_s = None if vd_wgt_imgs is None else vd_wgt_imgs[s]
        preps.append(prepare_fly(img_s, half_wnd=half_wnd, max_dis=md,
                                 th=th, tw=tw, scale=s, fine_hw=fine_hw,
                                 lerp=lerp, wgt_imgs_u8=wgt_s))
        md //= 2
    return preps


def cross_scale_fly_cost_prepared(preps, scale_wgts, abc: jax.Array, *,
                                  half_wnd: int, max_dis: int,
                                  gamma: float, alpha: float = 0.1,
                                  tau_clr: float = 10.0,
                                  tau_grd: float = 2.0,
                                  border_thres: float = 3.0, th: int = 64,
                                  tw: int = 128) -> jax.Array:
    """Cross-scale on-the-fly aggregated plane cost (fused kernel per
    level, no HBM volumes) -- the TPU-native CSPC (cspc.cc:107-182
    capability).  With preps built lerp="cost" the window/lerp semantics
    follow the Pre* window cost like the single-scale fly path; with
    lerp="image" each level applies CSPC's literal image-space sub-pixel
    warp into the level-s other view (element-exact vs
    ops.onthefly_cost.cs_fly_cost)."""
    # prepare_cross_scale_fly always builds uniform-lerp lists; a
    # hand-built mixed list would silently evaluate non-matching levels
    # with the wrong slab interpretation (clipped vs periodic extension)
    assert all(p.lerp == preps[0].lerp for p in preps), \
        "preps must share one lerp mode"
    params = plane_params(abc, th=th, tw=tw)
    sat = jnp.float32(fly_sat_cost(alpha, tau_clr, tau_grd))
    maxc = jnp.stack([sat, sat])
    total = None
    md = max_dis
    for s, prep in enumerate(preps):
        fp = dict(alpha=alpha, tau_clr=tau_clr, tau_grd=tau_grd,
                  border_thres=border_thres, lerp=prep.lerp,
                  data_ch0=prep.data_ch0)
        cost_s = _invoke(prep, maxc, params, half_wnd=half_wnd,
                         max_dis_s=md, gamma=gamma, th=th, tw=tw,
                         fly_params=fp)
        term = jnp.float32(scale_wgts[s]) * cost_s
        total = term if total is None else total + term
        md //= 2
    return total


@functools.partial(jax.jit, static_argnames=(
    "half_wnd", "max_dis", "gamma", "th", "tw", "lerp"))
def fly_plane_cost_pallas(imgs_u8: jax.Array, abc: jax.Array, *,
                          half_wnd: int, max_dis: int, gamma: float,
                          th: int = 64, tw: int = 128,
                          lerp: str = "cost") -> jax.Array:
    """One-shot convenience wrapper: prepare + evaluate (used by tests)."""
    prep = prepare_fly(imgs_u8, half_wnd=half_wnd, max_dis=max_dis,
                       th=th, tw=tw, lerp=lerp)
    return fly_plane_cost_prepared(prep, abc, half_wnd=half_wnd,
                                   max_dis=max_dis, gamma=gamma, th=th,
                                   tw=tw)


def prepare_cross_scale(vd_imgs, vd_vols, *, half_wnd: int, th: int = 64,
                        tw: int = 128, vol_dtype=jnp.float32):
    """Kernel layouts for every pyramid level of a VolumeData.

    vd_imgs[s]: u8[2, Hs, Ws, 3]; vd_vols[s]: f32[2, Hs, Ws, Ds].
    """
    fine_hw = vd_imgs[0].shape[1:3]
    return [prepare_volumes(img_s, vol_s, half_wnd=half_wnd, th=th, tw=tw,
                            scale=s, fine_hw=fine_hw, vol_dtype=vol_dtype)
            for s, (img_s, vol_s) in enumerate(zip(vd_imgs, vd_vols))]


def cross_scale_plane_cost_prepared(preps, max_costs_s, scale_wgts,
                                    abc: jax.Array, *, half_wnd: int,
                                    max_dis: int, gamma: float, th: int = 64,
                                    tw: int = 128,
                                    ybounds_s=None) -> jax.Array:
    """Cross-scale aggregated plane cost, fused kernel per level.

    sum_s wgt_s * cost_s with the plane re-anchored through the level-s
    point (x >> s, y >> s, d / 2^s) (pre_cs_pc.cc:133-188); identical
    semantics to ops.plane_cost.cross_scale_plane_cost vmapped over views.

    Args:
      preps: prepare_cross_scale output (level 0 finest).
      max_costs_s[s]: f32[2] per-view per-level saturation values.
      scale_wgts: inter-scale regularization weights (ops.scale_weights).
      abc: f32[2, K, H, W, 3] candidate plane fields.
      ybounds_s: optional per-scale i32[2] local-row validity intervals
        (spatially sharded bands); defaults to standalone-image bounds.

    Returns:
      f32[2, K, H, W].
    """
    params = plane_params(abc, th=th, tw=tw)
    total = None
    md = max_dis
    for s, prep in enumerate(preps):
        yb = None if ybounds_s is None else ybounds_s[s]
        cost_s = _invoke(prep, max_costs_s[s], params, half_wnd=half_wnd,
                         max_dis_s=md, gamma=gamma, th=th, tw=tw,
                         ybounds=yb)
        term = jnp.float32(scale_wgts[s]) * cost_s
        total = term if total is None else total + term
        md //= 2
    return total


@functools.partial(jax.jit, static_argnames=(
    "half_wnd", "max_dis", "gamma", "th", "tw"))
def window_plane_cost_pallas(imgs_u8: jax.Array, vols: jax.Array,
                             max_costs: jax.Array, abc: jax.Array, *,
                             half_wnd: int, max_dis: int, gamma: float,
                             th: int = 64, tw: int = 128) -> jax.Array:
    """One-shot convenience wrapper: prepare + evaluate (used by tests)."""
    prep = prepare_volumes(imgs_u8, vols, half_wnd=half_wnd, th=th, tw=tw)
    return window_plane_cost_prepared(prep, max_costs, abc,
                                      half_wnd=half_wnd, max_dis=max_dis,
                                      gamma=gamma, th=th, tw=tw)


@functools.partial(jax.jit, static_argnames=(
    "scale_wgts", "half_wnd", "max_dis", "gamma", "th", "tw"))
def cross_scale_plane_cost_pallas(pyr_imgs, pyr_vols, pyr_max_costs,
                                  scale_wgts, abc: jax.Array, *,
                                  half_wnd: int, max_dis: int, gamma: float,
                                  th: int = 64, tw: int = 128) -> jax.Array:
    """One-shot convenience wrapper: prepare + evaluate (used by tests).

    pyr_imgs / pyr_vols / pyr_max_costs are per-level tuples (level 0
    finest); scale_wgts a static tuple of floats.
    """
    preps = prepare_cross_scale(pyr_imgs, pyr_vols, half_wnd=half_wnd,
                                th=th, tw=tw)
    return cross_scale_plane_cost_prepared(
        preps, pyr_max_costs, scale_wgts, abc, half_wnd=half_wnd,
        max_dis=max_dis, gamma=gamma, th=th, tw=tw)
