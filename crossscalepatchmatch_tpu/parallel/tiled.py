"""Spatially-tiled + data-parallel PatchMatch over a (data, ty) device mesh.

Sharding layout (SURVEY.md sections 2.3/5):
  * "data" shards independent stereo pairs (batch DP, rides DCN across
    hosts);
  * "ty" shards the image rows of each pair into horizontal bands (spatial
    tiling -- the stereo analogue of sequence parallelism), with halo
    exchange over ICI neighbors via lax.ppermute:
      - image + cost-volume halos: half_wnd (17 for wnd=35) rows, exchanged
        once after the volume build;
      - plane-state halos: max(far_offsets) rows, exchanged before every
        propagation sweep;
      - disparity/validity/image halos for the weighted-median, once.
  * Both views of a pair live on the same shard: view propagation and the
    LR check are x-axis gathers, so they never cross "ty" shards.

Coordinate convention: each shard stores planes in *local-row* coordinates
(d = a*x + b*y_local + c).  When a plane crosses a shard boundary during
halo exchange its c is re-anchored (c +- b*Hs) so the same (a, b, c)
convention holds everywhere; x coordinates are global (rows are full-width).

Row-local pieces (GRD cost volume build: color diffs + x-Sobel; view
propagation; refinement; LR check; scanline fill) run unchanged on each
band.  The census volume build needs global row context (9x9 wrap
borders) and the cross-scale path needs whole-image pyramids: for those
the views (~0.5 MB/pair) are all-gathered along "ty" once and the coarse
per-scale volumes are built replicated on every shard -- the coarse
levels cost a geometrically decaying fraction of the fine level, so
sharding them would buy nothing.  On TPU every scale evaluates through
the fused Pallas window-cost kernel with band-local row-validity bounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import CostMethod, CSPMConfig
from ..models import patchmatch as pm
from ..models import postprocess as pp
from ..ops import plane
from ..ops.cost_volume import build_volume
from ..ops.color import bgr_to_rgb
from ..ops.plane_cost import window_plane_cost


def extend_rows(x: jax.Array, halo: int, axis_name: str = "ty") -> jax.Array:
    """Prepend/append `halo` rows from the up/down mesh neighbors.

    Halos taller than one band are served by multi-hop exchange: the piece
    of the band at distance j moves in a single distance-j ppermute, so a
    halo of ceil(halo/Hs) bands costs that many ppermutes (all riding ICI
    neighbors-of-neighbors), and far propagation rings / window halos are
    never silently truncated by small bands.

    Devices at the mesh edge receive zeros for rows past the global image
    (lax.ppermute semantics), which callers mask via a row-validity vector.
    """
    n = jax.lax.axis_size(axis_name)
    hs = x.shape[0]
    hops = -(-halo // hs)                          # bands touched per side
    rem = halo - (hops - 1) * hs                   # rows from the far band
    above, below = [], []
    for j in range(hops, 0, -1):                   # farthest band first
        take = rem if j == hops else hs
        down = [(i, i + j) for i in range(n - j)]  # my rows -> j-th below
        up = [(i + j, i) for i in range(n - j)]    # my rows -> j-th above
        above.append(jax.lax.ppermute(x[-take:], axis_name, down))
        below.append(jax.lax.ppermute(x[:take], axis_name, up))
    return jnp.concatenate(above + [x] + below[::-1], axis=0)


def _extend_planes(abc: jax.Array, halo: int, hs: int) -> jax.Array:
    """Halo-exchange plane state, re-anchoring c into local coordinates.

    A plane received from the shard j bands above was expressed with row
    index y + j*Hs, so c_local = c_remote + b*j*Hs; from below,
    c_local = c - b*j*Hs.  j varies per extended row when the halo spans
    multiple bands (multi-hop exchange).
    """
    ext = extend_rows(abc, halo)
    top, mid, bot = ext[:halo], ext[halo:halo + hs], ext[halo + hs:]
    e = jnp.arange(halo)
    j_top = ((halo - e + hs - 1) // hs).astype(abc.dtype)  # source distance
    j_bot = (e // hs + 1).astype(abc.dtype)
    top = top.at[..., 2].add(top[..., 1] * (j_top * hs)[:, None])
    bot = bot.at[..., 2].add(-bot[..., 1] * (j_bot * hs)[:, None])
    return jnp.concatenate([top, mid, bot], axis=0)


def _band_ext_from_full(full: jax.Array, row0: jax.Array, hs: int,
                        halo: int) -> jax.Array:
    """Rows [row0 - halo, row0 + hs + halo) of a replicated full-height
    array, zero-filled outside the global image (the gather analogue of
    extend_rows for data every shard holds in full)."""
    pad = jnp.pad(full, ((halo, halo),) + ((0, 0),) * (full.ndim - 1))
    return jax.lax.dynamic_slice_in_dim(pad, row0, hs + 2 * halo, axis=0)


def _pair_sharded(l_loc: jax.Array, r_loc: jax.Array, seed: jax.Array,
                  cfg: CSPMConfig, n_ty: int) -> jax.Array:
    """Full pipeline for one pair's local row band [Hs, W, 3] per view.

    Data placement: the fine-scale GRD volume is row-local and built on the
    band; the census volume needs global row context (9x9 wrap borders,
    cen_cc.cc:30-43) and the cross-scale path needs whole-image pyramids,
    so for those the (tiny) views are all-gathered along "ty" once and the
    coarse per-scale volumes are built replicated on every shard -- coarse
    levels cost a geometrically decaying fraction of the fine level and
    sharding them would buy nothing (SURVEY.md section 7.8).
    """
    hs, w, _ = l_loc.shape
    hw = cfg.half_wnd
    # Far rings taller than the band are served by multi-hop halo exchange
    # (extend_rows), so the sweep stencil -- and therefore propagation
    # reach -- is identical to the single-device schedule on any band size.
    far = max(max(cfg.far_offsets, default=0), 1)

    ty = jax.lax.axis_index("ty")
    row0 = ty * hs
    h_glob = n_ty * hs
    key = jax.random.fold_in(jax.random.PRNGKey(seed), ty)
    levels = cfg.scale_num if cfg.use_cs else 1
    from ..config import Aggregator
    from ..ops.cost_volume import aggregate_volume
    aggregated = cfg.aggregator != Aggregator.NONE
    # aggregation filters span rows, so they also need the full views
    need_full = (cfg.use_cs or cfg.cost_method != CostMethod.GRD
                 or aggregated)

    imgs = jnp.stack([l_loc, r_loc])
    if need_full:
        full_imgs = jax.lax.all_gather(imgs, "ty", axis=1, tiled=True)

    # --- fine-scale volumes + global saturation value ----------------------
    if cfg.cost_method == CostMethod.GRD and not aggregated:
        # row-local build; halos exchanged with ICI neighbors
        l_rgb, r_rgb = bgr_to_rgb(l_loc), bgr_to_rgb(r_loc)
        vols = jnp.stack(
            [build_volume(l_rgb, r_rgb, cfg.max_dis, cfg, right=False),
             build_volume(l_rgb, r_rgb, cfg.max_dis, cfg, right=True)])
        ext_vols = jax.vmap(lambda x: extend_rows(x, hw))(vols)
    else:
        # census wraps at global borders and aggregation filters span
        # rows: build from the gathered views, slice the band + halo
        lf, rf = bgr_to_rgb(full_imgs[0]), bgr_to_rgb(full_imgs[1])
        vl = build_volume(lf, rf, cfg.max_dis, cfg, right=False)
        vr = build_volume(lf, rf, cfg.max_dis, cfg, right=True)
        vl = aggregate_volume(vl, full_imgs[0], cfg)
        vr = aggregate_volume(vr, full_imgs[1], cfg)
        vols_full = jnp.stack([vl, vr])
        ext_vols = jax.vmap(
            lambda x: _band_ext_from_full(x, row0, hs, hw))(vols_full)
        vols = ext_vols[:, hw:hw + hs]
    max_cost = jax.lax.pmax(jnp.max(vols, axis=(1, 2, 3)), "ty")  # [2]

    # --- static halos: image + volume, and row validity -------------------
    ext_imgs = jax.vmap(lambda x: extend_rows(x, hw))(imgs)
    g_row = row0 + jnp.arange(-hw, hs + hw)
    row_valid = (g_row >= 0) & (g_row < h_glob)

    # --- coarse scales: replicated pyramids + volumes ----------------------
    if cfg.use_cs:
        from ..ops.pyramid import build_pyramid
        from ..ops.scale_weights import scale_weights

        l_pyr = build_pyramid(full_imgs[0], levels)
        r_pyr = build_pyramid(full_imgs[1], levels)
        wgts = tuple(float(x) for x in
                     scale_weights(levels, cfg.reg_lambda))
        coarse_imgs, coarse_vols, coarse_mcs = [], [], []
        md = cfg.max_dis
        for s in range(1, levels):
            md //= 2
            ls, rs = bgr_to_rgb(l_pyr[s]), bgr_to_rgb(r_pyr[s])
            v_s = jnp.stack(
                [aggregate_volume(build_volume(ls, rs, md, cfg, right=False),
                                  l_pyr[s], cfg),
                 aggregate_volume(build_volume(ls, rs, md, cfg, right=True),
                                  r_pyr[s], cfg)])
            coarse_imgs.append(jnp.stack([l_pyr[s], r_pyr[s]]))
            coarse_vols.append(v_s)
            coarse_mcs.append(jnp.max(v_s, axis=(1, 2, 3)))

    sparse_fn = None   # strided prescreen evaluator (single-scale only)
    if cfg.use_pallas and jax.default_backend() == "tpu":
        # Fused kernel on the band: neighbor-halo rows are valid image
        # rows, rows past the global border are not -- expressed as the
        # [ylo, yhi) local-row interval scalar-prefetched into the kernel.
        from ..ops.pallas.window_cost import (
            cross_scale_plane_cost_prepared, prepare_volumes,
            window_plane_cost_prepared)
        prep0 = prepare_volumes(ext_imgs, ext_vols, half_wnd=hw,
                                rows_extended=True)
        yb0 = jnp.stack([-row0, h_glob - row0]).astype(jnp.int32)
        if cfg.use_cs:
            preps = [prep0]
            ybounds_s = [yb0]
            mcs = [max_cost]
            for s in range(1, levels):
                preps.append(prepare_volumes(
                    coarse_imgs[s - 1], coarse_vols[s - 1], half_wnd=hw,
                    scale=s, fine_hw=(hs, w), row0=row0))
                hs_s = coarse_imgs[s - 1].shape[1]
                ybounds_s.append(
                    jnp.stack([-row0, (hs_s << s) - row0]).astype(jnp.int32))
                mcs.append(coarse_mcs[s - 1])

            def cost_fn(abc2: jax.Array) -> jax.Array:
                return cross_scale_plane_cost_prepared(
                    preps, mcs, wgts, abc2, half_wnd=hw,
                    max_dis=cfg.max_dis, gamma=cfg.wgt_gamma,
                    ybounds_s=ybounds_s, slab=cfg.pallas_slab)
        else:
            def cost_fn(abc2: jax.Array) -> jax.Array:
                return window_plane_cost_prepared(
                    prep0, max_cost, abc2, half_wnd=hw,
                    max_dis=cfg.max_dis, gamma=cfg.wgt_gamma, ybounds=yb0,
                    slab=cfg.pallas_slab)

            if cfg.prescreen_stride > 1:
                def sparse_fn(abc2: jax.Array) -> jax.Array:
                    return window_plane_cost_prepared(
                        prep0, max_cost, abc2, half_wnd=hw,
                        max_dis=cfg.max_dis, gamma=cfg.wgt_gamma,
                        ybounds=yb0, slab=cfg.pallas_slab,
                        wnd_stride=cfg.prescreen_stride)
    else:
        if cfg.use_cs and jax.default_backend() == "tpu":
            # see models.patchmatch.make_cost_fns: the jnp upsampled
            # cross-scale path crashes the XLA:TPU worker at wnd=35
            raise RuntimeError(
                "the jnp cross-scale plane cost is not supported on TPU; "
                "use the fused kernel path (use_pallas=True) or run on CPU")
        from ..ops.plane_cost import (upsample_level, upsample_valid,
                                      window_plane_cost_upsampled)

        def cost_fn(abc2: jax.Array) -> jax.Array:
            fn = functools.partial(window_plane_cost, half_wnd=hw,
                                   max_dis=cfg.max_dis, gamma=cfg.wgt_gamma,
                                   center_row0=hw, row_valid=row_valid)
            total = jax.vmap(fn)(ext_imgs, ext_vols, max_cost, abc2)
            if not cfg.use_cs:
                return total
            total = jnp.float32(wgts[0]) * total
            md = cfg.max_dis
            for s in range(1, levels):
                md //= 2

                def per_view(img_s, vol_s, mc_s, abc, s=s, md=md):
                    iu = upsample_level(img_s, s, hw, (hs, w), row0)
                    vu = upsample_level(vol_s, s, hw, (hs, w), row0)
                    valid = upsample_valid(s, hw, (hs, w),
                                           img_s.shape[:2], row0)
                    return window_plane_cost_upsampled(
                        iu, vu, valid, mc_s, abc, scale=s, half_wnd=hw,
                        max_dis_s=md, gamma=cfg.wgt_gamma)

                cost_s = jax.vmap(per_view)(
                    coarse_imgs[s - 1], coarse_vols[s - 1],
                    coarse_mcs[s - 1], abc2)
                total = total + jnp.float32(wgts[s]) * cost_s
            return total

        if cfg.prescreen_stride > 1 and not cfg.use_cs:
            def sparse_fn(abc2: jax.Array) -> jax.Array:
                fn = functools.partial(
                    window_plane_cost, half_wnd=hw, max_dis=cfg.max_dis,
                    gamma=cfg.wgt_gamma, center_row0=hw,
                    row_valid=row_valid,
                    wnd_stride=cfg.prescreen_stride)
                return jax.vmap(fn)(ext_imgs, ext_vols, max_cost, abc2)

    if cfg.use_cs:
        sparse_fn = None     # prescreen is single-scale only

    # --- optimizer --------------------------------------------------------
    k_init, k_loop = jax.random.split(key)
    state = pm.init_state(k_init, (hs, w), cost_fn, cfg)

    def sweep(state: pm.PMState, i: int) -> pm.PMState:
        ext_abc = jax.vmap(lambda a: _extend_planes(a, far, hs))(state.abc)
        cands = [jnp.roll(ext_abc, (dy, dx), axis=(1, 2))[:, far:far + hs]
                 for dy, dx in pm._stencil(cfg, i)]
        cand_abc = pm._prescreen(jnp.stack(cands, axis=1), sparse_fn)
        return pm._adopt(state, cand_abc, cost_fn(cand_abc))

    def iteration(state, it_key):
        for i in range(cfg.prop_sweeps):
            state = sweep(state, i)
        state = pm.view_propagation(state, cost_fn, cfg)
        state = pm.plane_refinement(state, it_key, cost_fn, cfg,
                                    sparse_fn=sparse_fn)
        return state, None

    keys = jax.random.split(k_loop, cfg.max_iter)
    state, _ = jax.lax.scan(iteration, state, keys)

    dis = pm.plane_to_disp(state.abc, cfg.dis_scale)
    if cfg.use_pp:
        valid = pp.lr_check(dis, cfg)
        dis = pp.fill_invalid(dis, state.abc, valid, cfg)
        ext_dis = jax.vmap(lambda x: extend_rows(x, hw))(dis)
        ext_valid = (jax.vmap(lambda x: extend_rows(x, hw))(valid)
                     & row_valid[None, :, None])
        dis = pp.weighted_median(ext_dis, ext_imgs, ext_valid, cfg,
                                 center_row0=hw, out_h=hs)
    return dis


def run_batch_sharded(l_bgr: jax.Array, r_bgr: jax.Array, seeds: jax.Array,
                      cfg: CSPMConfig, mesh: Mesh) -> jax.Array:
    """Batched sharded pipeline.

    Args:
      l_bgr / r_bgr: u8[B, H, W, 3]; B divisible by mesh "data", H by "ty".
      seeds: i32[B].

    Returns:
      u8[B, 2, H, W] scaled disparity maps.
    """
    if not cfg.precompute_volume:
        raise NotImplementedError(
            "sharded path supports precomputed volumes only (the "
            "on-the-fly GrdPC/CSPC cost is single-device)")
    n_ty = mesh.shape["ty"]

    # check_vma only where it must be off: pallas_call outputs carry no
    # varying-axes metadata, which the vma checker (on by default) rejects
    # under shard_map -- but the jnp path keeps the checker so it still
    # catches real sharding bugs there.
    pallas_active = cfg.use_pallas and jax.default_backend() == "tpu"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data", "ty"), P("data", "ty"), P("data")),
        out_specs=P("data", None, "ty", None), check_vma=not pallas_active)
    def fn(l_blk, r_blk, seed_blk):
        return jax.vmap(
            lambda l1, r1, s: _pair_sharded(l1, r1, s, cfg, n_ty))(
                l_blk, r_blk, seed_blk)

    return fn(l_bgr, r_bgr, seeds)


def jit_run_batch_sharded(cfg: CSPMConfig, mesh: Mesh):
    """jit-wrapped runner with cfg/mesh bound statically."""
    return jax.jit(functools.partial(run_batch_sharded, cfg=cfg, mesh=mesh))
