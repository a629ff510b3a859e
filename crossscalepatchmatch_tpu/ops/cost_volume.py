"""Cost-volume construction dispatch: method selection, pyramids, max-cost.

Replaces the reference's CCMethod factory + PreSSPC/PreCSPC constructor
plumbing (main.cc:39-55, pre_ss_pc.cc:12-65, pre_cs_pc.cc:12-115): build the
left/right-referenced volumes for the chosen cost method at one or
scale_num pyramid levels, record the per-view per-scale saturation value
max(volume), and optionally run a per-slice aggregation filter
(ca_method.h capability surface).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..config import Aggregator, CostMethod, CSPMConfig
from .census import census_cost_volume
from .color import bgr_to_lab_u8, bgr_to_rgb, rgb_to_gray_u8
from .grad_cost import grd_cost_volume
from .pyramid import build_pyramid


@dataclasses.dataclass
class VolumeData:
    """Per-view precomputed data for plane-cost evaluation.

    imgs[s]: u8[2, Hs, Ws, 3] per-view level-s images (original channel order)
    vols[s]: f32[2, Hs, Ws, Ds] per-view level-s cost volumes
    max_costs[s]: f32[2] per-view saturation values
    wimgs[s]: optional per-view level-s ASW weight images (the Lab
      conversions when cfg.use_lab_weights, the USE_LAB_WGT capability of
      grd_pc.h:25); None means weights use imgs (the reference's active
      BGR path).  Post-processing always reads imgs -- the weighted
      median's LUT is BGR even in the reference's Lab variant
      (cs_patchmatch.cc:434-437).
    """

    imgs: List[jax.Array]
    vols: List[jax.Array]
    max_costs: List[jax.Array]
    wimgs: List[jax.Array] | None = None

    @property
    def weight_imgs(self) -> List[jax.Array]:
        return self.imgs if self.wimgs is None else self.wimgs


# Registered as a pytree so a built VolumeData can cross jit boundaries
# (e.g. checkpoint.run_pair_resumable builds volumes once and feeds them to
# every per-iteration step call).
jax.tree_util.register_pytree_node(
    VolumeData,
    lambda v: ((v.imgs, v.vols, v.max_costs, v.wimgs), None),
    lambda _, ch: VolumeData(*ch))


def build_volume(l_rgb_u8: jax.Array, r_rgb_u8: jax.Array, max_dis: int,
                 cfg: CSPMConfig, right: bool) -> jax.Array:
    """One cost volume for one reference view at one scale.

    The reference feeds CV_64F RGB images scaled 0..255 to both cost methods
    (pre_ss_pc.cc:32-36); census re-quantizes to uint8 internally
    (cen_cc.cc:12-17), which round-trips losslessly from uint8 input.
    """
    if cfg.cost_method == CostMethod.GRD:
        return grd_cost_volume(
            l_rgb_u8.astype(jnp.float32), r_rgb_u8.astype(jnp.float32),
            max_dis, alpha=cfg.cost_alpha, tau_clr=cfg.tau_clr,
            tau_grd=cfg.tau_grd, border_thres=cfg.border_thres, right=right)
    elif cfg.cost_method == CostMethod.CEN:
        return census_cost_volume(
            rgb_to_gray_u8(l_rgb_u8), rgb_to_gray_u8(r_rgb_u8),
            max_dis, wnd=cfg.census_wnd, right=right)
    raise ValueError(f"unknown cost method {cfg.cost_method}")


def aggregate_volume(vol: jax.Array, guide_u8: jax.Array,
                     cfg: CSPMConfig) -> jax.Array:
    """Apply the configured per-slice aggregation filter (ca_method.h
    capability surface) to one view's cost volume."""
    if cfg.aggregator == Aggregator.NONE:
        return vol
    from . import filters  # local import to avoid cycles
    if cfg.aggregator == Aggregator.BOX:
        return filters.box_filter_volume(vol, radius=3)
    if cfg.aggregator == Aggregator.GF:
        return filters.guided_filter_volume(vol, guide_u8, radius=9,
                                            eps=1e-4)
    if cfg.aggregator == Aggregator.BF:
        return filters.bilateral_filter_volume(vol, guide_u8,
                                               wnd=cfg.wnd_size)
    raise ValueError(f"unknown aggregator {cfg.aggregator}")


def build_volume_data(l_bgr_u8: jax.Array, r_bgr_u8: jax.Array,
                      cfg: CSPMConfig) -> VolumeData:
    """All per-scale per-view volumes for a stereo pair.

    Args:
      l_bgr_u8 / r_bgr_u8: u8[H, W, 3] views in the loader's channel order
        (the reference keeps OpenCV BGR for the ASW weights and converts to
        RGB for volume building; both only consume channel sums/diffs).

    Returns:
      VolumeData with scale_num levels when cfg.use_cs else 1 level.
    """
    levels = cfg.scale_num if cfg.use_cs else 1
    l_pyr = build_pyramid(l_bgr_u8, levels)
    r_pyr = build_pyramid(r_bgr_u8, levels)
    imgs, vols, max_costs = [], [], []
    wimgs = [] if cfg.use_lab_weights else None
    md = cfg.max_dis
    for s in range(levels):
        l_rgb = bgr_to_rgb(l_pyr[s])
        r_rgb = bgr_to_rgb(r_pyr[s])
        vol_l = build_volume(l_rgb, r_rgb, md, cfg, right=False)
        vol_r = build_volume(l_rgb, r_rgb, md, cfg, right=True)
        vol_l = aggregate_volume(vol_l, l_pyr[s], cfg)
        vol_r = aggregate_volume(vol_r, r_pyr[s], cfg)
        imgs.append(jnp.stack([l_pyr[s], r_pyr[s]]))
        vols.append(jnp.stack([vol_l, vol_r]))
        max_costs.append(jnp.stack([jnp.max(vol_l), jnp.max(vol_r)]))
        if wimgs is not None:
            # per-level Lab like CSPC's per-level conversion (cspc.cc:48-49)
            wimgs.append(bgr_to_lab_u8(imgs[-1]))
        md //= 2
    return VolumeData(imgs=imgs, vols=vols, max_costs=max_costs,
                      wimgs=wimgs)
