"""Kernel-logic check of the Pallas window-cost kernel in interpreter mode.

Runs on CPU via pltpu.force_tpu_interpret_mode so the fused kernel's
masking/trunc/saturation semantics are exercised by the regular (CPU) test
suite; element-exactness on real TPU hardware is covered by
tests_tpu/test_pallas_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
    window_plane_cost_pallas)
from crossscalepatchmatch_tpu.ops.plane_cost import window_plane_cost


@pytest.mark.parametrize("k", [1, 3])
def test_kernel_matches_jnp_interpret(k):
    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32)
    mc = jnp.max(vols, axis=(1, 2, 3))
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        got = window_plane_cost_pallas(
            imgs, vols, mc, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
            imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_deep_volume_matches_jnp_interpret():
    """Deep volume (D=40), a smooth narrow-band candidate and a wild
    whole-volume candidate in the same batch."""
    h, w, d, wnd = 16, 40, 40, 5
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32)
    mc = jnp.max(vols, axis=(1, 2, 3))
    # candidate 0: near-fronto planes in a narrow disparity band
    ab0 = jax.random.uniform(k3, (2, 1, h, w, 2), jnp.float32, -0.05, 0.05)
    dc0 = jax.random.uniform(k3, (2, 1, h, w), jnp.float32, 20.0, 24.0)
    # candidate 1: arbitrary planes spanning the whole volume
    ab1 = jax.random.uniform(k2, (2, 1, h, w, 2), jnp.float32, -1, 1)
    dc1 = jax.random.uniform(k2, (2, 1, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    for ab, dc in [(ab0, dc0),
                   (jnp.concatenate([ab0, ab1], axis=1),
                    jnp.concatenate([dc0, dc1], axis=1))]:
        c = dc - ab[..., 0] * xs - ab[..., 1] * ys
        abc = jnp.concatenate([ab, c[..., None]], axis=-1)
        with pltpu.force_tpu_interpret_mode():
            got = window_plane_cost_pallas(
                imgs, vols, mc, abc, half_wnd=wnd // 2, max_dis=d,
                gamma=10.0, th=8, tw=128)
        want = jax.vmap(lambda i, v, m, a: window_plane_cost(
            i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
                imgs, vols, mc, abc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_kernel_slanted_plus_wild_matches_jnp_interpret():
    """A converged SLANTED field (dq spans ~a*width disparities across the
    tile) with a wild whole-volume candidate mixed in -- the two field
    regimes the optimizer actually feeds the kernel."""
    h, w, d, wnd = 24, 96, 32, 5
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32)
    mc = jnp.max(vols, axis=(1, 2, 3))
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    # slanted field: common slope 0.25 (dq spans ~24 disparities over the
    # 96-px width) with small per-pixel jitter
    a0 = 0.25 + jax.random.uniform(k3, (2, 1, h, w), jnp.float32,
                                   -0.02, 0.02)
    b0 = jax.random.uniform(k3, (2, 1, h, w), jnp.float32, -0.03, 0.03)
    dc0 = (4.0 + 0.25 * xs
           + jax.random.uniform(k3, (2, 1, h, w), jnp.float32, -0.5, 0.5))
    # wild candidate: spans the whole volume (fallback in the same launch)
    ab1 = jax.random.uniform(k4, (2, 1, h, w, 2), jnp.float32, -1, 1)
    dc1 = jax.random.uniform(k4, (2, 1, h, w), jnp.float32, 0, d)
    ab = jnp.concatenate(
        [jnp.stack([a0, b0], axis=-1), ab1], axis=1)
    dc = jnp.concatenate([dc0, dc1], axis=1)
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        prepare_volumes, window_plane_cost_prepared)

    with pltpu.force_tpu_interpret_mode():
        prep = prepare_volumes(imgs, vols, half_wnd=wnd // 2, th=8, tw=128)
        got = window_plane_cost_prepared(
            prep, mc, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
            imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_wnd_stride_matches_jnp_interpret():
    """Strided (prescreen) window evaluation: kernel vs jnp, stride 2."""
    h, w, d, wnd = 24, 40, 8, 7
    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32)
    mc = jnp.max(vols, axis=(1, 2, 3))
    ab = jax.random.uniform(k3, (2, 2, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(k3, (2, 2, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        prepare_volumes, window_plane_cost_prepared)

    with pltpu.force_tpu_interpret_mode():
        prep = prepare_volumes(imgs, vols, half_wnd=wnd // 2, th=8, tw=128)
        got = jax.jit(lambda p, m, a: window_plane_cost_prepared(
            p, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0, th=8,
            tw=128, wnd_stride=2))(prep, mc, abc)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
        wnd_stride=2))(imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_cross_scale_kernel_matches_jnp_interpret():
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        cross_scale_plane_cost_pallas)
    from crossscalepatchmatch_tpu.ops.plane_cost import cross_scale_plane_cost

    h, w, max_dis, wnd, k, scales = 24, 40, 8, 5, 2, 3
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 2 * scales + 2)
    hs, ws, md = h, w, max_dis
    imgs, vols, mcs = [], [], []
    for s in range(scales):
        imgs.append(jax.random.randint(keys[2 * s], (2, hs, ws, 3), 0, 255,
                                       jnp.uint8))
        v = jax.random.uniform(keys[2 * s + 1], (2, hs, ws, md + 1),
                               jnp.float32)
        vols.append(v)
        mcs.append(jnp.max(v, axis=(1, 2, 3)))
        hs, ws, md = (hs + 1) // 2, (ws + 1) // 2, md // 2
    ab = jax.random.uniform(keys[-2], (2, k, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(keys[-1], (2, k, h, w), jnp.float32, 0, max_dis)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)
    wgts = (0.5, 0.3, 0.2)

    with pltpu.force_tpu_interpret_mode():
        got = cross_scale_plane_cost_pallas(
            tuple(imgs), tuple(vols), tuple(mcs), wgts, abc,
            half_wnd=wnd // 2, max_dis=max_dis, gamma=10.0, th=8, tw=128)
    want = jax.vmap(lambda i0, i1, i2, v0, v1, v2, m, a: cross_scale_plane_cost(
        [i0, i1, i2], [v0, v1, v2], m, wgts, a,
        half_wnd=wnd // 2, max_dis=max_dis, gamma=10.0))(
            imgs[0], imgs[1], imgs[2], vols[0], vols[1], vols[2],
            jnp.stack(mcs, 1), abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fly_kernel_matches_volume_path_interpret():
    """Fused on-the-fly kernel (volume built in VMEM per tile) vs the jnp
    window cost over the GRD volume it virtualizes -- element-exact when
    the jnp side saturates at the fly path's analytic bound
    (fly_sat_cost)."""
    from crossscalepatchmatch_tpu.ops.color import bgr_to_rgb
    from crossscalepatchmatch_tpu.ops.grad_cost import grd_cost_volume
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        fly_plane_cost_pallas, fly_sat_cost)

    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(0)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    lr = bgr_to_rgb(imgs[0]).astype(jnp.float32)
    rr = bgr_to_rgb(imgs[1]).astype(jnp.float32)
    vols = jnp.stack([grd_cost_volume(lr, rr, d),
                      grd_cost_volume(lr, rr, d, right=True)])
    mc = jnp.full((2,), fly_sat_cost(0.1, 10.0, 2.0), jnp.float32)

    k = 3
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        got = fly_plane_cost_pallas(imgs, abc, half_wnd=wnd // 2,
                                    max_dis=d, gamma=10.0, th=8, tw=128)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
            imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_fly_cross_scale_and_deep_volume_interpret():
    """Cross-scale fly (per-level VMEM volumes) + deep-volume fly
    kernel."""
    from crossscalepatchmatch_tpu.ops.color import bgr_to_rgb
    from crossscalepatchmatch_tpu.ops.grad_cost import grd_cost_volume
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        cross_scale_fly_cost_prepared, fly_plane_cost_pallas, fly_sat_cost,
        prepare_cross_scale_fly)
    from crossscalepatchmatch_tpu.ops.plane_cost import (
        cross_scale_plane_cost)
    from crossscalepatchmatch_tpu.ops.pyramid import build_pyramid

    h, w, d, wnd, levels = 32, 48, 12, 5, 2
    key = jax.random.PRNGKey(2)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    l_pyr = build_pyramid(imgs[0], levels)
    r_pyr = build_pyramid(imgs[1], levels)
    sat = fly_sat_cost(0.1, 10.0, 2.0)
    wgts = (0.6, 0.4)
    pyr_imgs, pyr_vols, pyr_mc = [], [], []
    md = d
    for s in range(levels):
        lr = bgr_to_rgb(l_pyr[s]).astype(jnp.float32)
        rr = bgr_to_rgb(r_pyr[s]).astype(jnp.float32)
        pyr_imgs.append(jnp.stack([l_pyr[s], r_pyr[s]]))
        pyr_vols.append(jnp.stack([grd_cost_volume(lr, rr, md),
                                   grd_cost_volume(lr, rr, md, right=True)]))
        pyr_mc.append(jnp.full((2,), sat, jnp.float32))
        md //= 2

    k = 2
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -0.5, 0.5)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        preps = prepare_cross_scale_fly(pyr_imgs, half_wnd=wnd // 2,
                                        max_dis=d, th=8, tw=128)
        got = cross_scale_fly_cost_prepared(
            preps, wgts, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)

    def one_view(v):
        return cross_scale_plane_cost(
            [p[v] for p in pyr_imgs], [p[v] for p in pyr_vols],
            [m[v] for m in pyr_mc], wgts, abc[v], half_wnd=wnd // 2,
            max_dis=d, gamma=10.0)

    want = jnp.stack([one_view(0), one_view(1)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)

    # deep volume: one smooth candidate + one wild whole-volume candidate
    h2, w2, d2 = 16, 40, 40
    imgs2 = jax.random.randint(k1, (2, h2, w2, 3), 0, 255, jnp.uint8)
    lr2 = bgr_to_rgb(imgs2[0]).astype(jnp.float32)
    rr2 = bgr_to_rgb(imgs2[1]).astype(jnp.float32)
    vol2 = jnp.stack([grd_cost_volume(lr2, rr2, d2),
                      grd_cost_volume(lr2, rr2, d2, right=True)])
    mc2 = jnp.full((2,), sat, jnp.float32)
    ab0 = jax.random.uniform(k3, (2, 1, h2, w2, 2), jnp.float32,
                             -0.05, 0.05)
    dc0 = jax.random.uniform(k3, (2, 1, h2, w2), jnp.float32, 20.0, 24.0)
    ab1 = jax.random.uniform(k1, (2, 1, h2, w2, 2), jnp.float32, -1, 1)
    dc1 = jax.random.uniform(k1, (2, 1, h2, w2), jnp.float32, 0, d2)
    ab2 = jnp.concatenate([ab0, ab1], axis=1)
    dc2 = jnp.concatenate([dc0, dc1], axis=1)
    xs2 = jnp.arange(w2, dtype=jnp.float32)
    ys2 = jnp.arange(h2, dtype=jnp.float32)[:, None]
    c2 = dc2 - ab2[..., 0] * xs2 - ab2[..., 1] * ys2
    abc2 = jnp.concatenate([ab2, c2[..., None]], axis=-1)
    with pltpu.force_tpu_interpret_mode():
        got2 = fly_plane_cost_pallas(imgs2, abc2, half_wnd=wnd // 2,
                                     max_dis=d2, gamma=10.0, th=8, tw=128)
    want2 = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d2, gamma=10.0))(
            imgs2, vol2, mc2, abc2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-4)


def test_fly_image_lerp_matches_literal_grd_pc_interpret():
    """fly_lerp="image": the kernel's literal GrdPC mode (image-space
    sub-pixel lerp with C-trunc taps and HandleBorder column wrap,
    grd_pc.cc:149-171) vs the authoritative jnp grd_fly_cost.

    Candidate spread is chosen to exercise every semantics corner:
    in-range warps, out-of-range saturation, and negative/past-width
    warped positions (column wrap + trunc-extrapolation weights)."""
    from crossscalepatchmatch_tpu.ops.onthefly_cost import (grd_fly_cost,
                                                            gray_gradient)
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        fly_plane_cost_pallas)

    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(11)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    grd = gray_gradient(imgs)

    k = 3
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        got = fly_plane_cost_pallas(imgs, abc, half_wnd=wnd // 2,
                                    max_dis=d, gamma=10.0, th=8, tw=128,
                                    lerp="image")
    kw = dict(half_wnd=wnd // 2, max_dis=d, gamma=10.0)
    want = jnp.stack([
        grd_fly_cost(imgs[0], imgs[1], grd[0], grd[1], abc[0], sign=-1,
                     **kw),
        grd_fly_cost(imgs[1], imgs[0], grd[1], grd[0], abc[1], sign=+1,
                     **kw)])
    # atol: image-space lerp multiplies the plane-eval's f32 FMA-contraction
    # ULP differences (kernel vs XLA-fused jnp) by 0..255 channel values --
    # ~25x the amplification of the cost-space tests (costs are <= ~10);
    # measured worst element 4e-4 over 5760.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-3)


@pytest.mark.slow
def test_fly_cs_image_lerp_matches_literal_cspc_interpret():
    """Cross-scale fly_lerp="image" (literal CSPC: per-level image-space
    warp into the level-s other view, cspc.cc:107-182) vs cs_fly_cost."""
    from crossscalepatchmatch_tpu.ops.onthefly_cost import (cs_fly_cost,
                                                            gray_gradient)
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        cross_scale_fly_cost_prepared, prepare_cross_scale_fly)
    from crossscalepatchmatch_tpu.ops.pyramid import build_pyramid

    h, w, d, wnd, levels = 32, 48, 12, 5, 2
    key = jax.random.PRNGKey(5)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    l_pyr = build_pyramid(imgs[0], levels)
    r_pyr = build_pyramid(imgs[1], levels)
    l_grd = [gray_gradient(im) for im in l_pyr]
    r_grd = [gray_gradient(im) for im in r_pyr]
    pyr_imgs = [jnp.stack([l_pyr[s], r_pyr[s]]) for s in range(levels)]
    wgts = (0.6, 0.4)

    k = 2
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -0.5, 0.5)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    abc = jnp.concatenate([ab, c[..., None]], axis=-1)

    with pltpu.force_tpu_interpret_mode():
        preps = prepare_cross_scale_fly(pyr_imgs, half_wnd=wnd // 2,
                                        max_dis=d, th=8, tw=128,
                                        lerp="image")
        got = cross_scale_fly_cost_prepared(
            preps, wgts, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)
    kw = dict(half_wnd=wnd // 2, max_dis=d, gamma=10.0)
    want = jnp.stack([
        cs_fly_cost(l_pyr, r_pyr, l_grd, r_grd, wgts, abc[0], sign=-1,
                    **kw),
        cs_fly_cost(r_pyr, l_pyr, r_grd, l_grd, wgts, abc[1], sign=+1,
                    **kw)])
    # atol: see the single-scale image-lerp test (255-scale channel
    # amplification of plane-eval ULP differences).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-3)


def _plane_batch(key, k, h, w, d, spread=1.0):
    ka, kd = jax.random.split(key)
    ab = jax.random.uniform(ka, (2, k, h, w, 2), jnp.float32,
                            -spread, spread)
    dc = jax.random.uniform(kd, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    return jnp.concatenate([ab, c[..., None]], axis=-1)


def test_fly_lab_weights_cost_mode_interpret():
    """use_lab_weights on the fused no-volume fly kernel (round 5): the
    prefixed Lab weight-channel slab (prepare_fly wgt_imgs_u8) must
    reproduce the jnp window cost whose WEIGHT image is the Lab
    conversion while the volume stays the GRD data volume
    (grd_pc.h:25, grd_pc.cc:31-35 capability on the kernel path)."""
    from crossscalepatchmatch_tpu.ops.color import bgr_to_lab_u8, bgr_to_rgb
    from crossscalepatchmatch_tpu.ops.grad_cost import grd_cost_volume
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        fly_plane_cost_prepared, fly_sat_cost, prepare_fly)

    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(3)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    lab = bgr_to_lab_u8(imgs)
    lr = bgr_to_rgb(imgs[0]).astype(jnp.float32)
    rr = bgr_to_rgb(imgs[1]).astype(jnp.float32)
    vols = jnp.stack([grd_cost_volume(lr, rr, d),
                      grd_cost_volume(lr, rr, d, right=True)])
    mc = jnp.full((2,), fly_sat_cost(0.1, 10.0, 2.0), jnp.float32)
    abc = _plane_batch(k3, 3, h, w, d)

    with pltpu.force_tpu_interpret_mode():
        prep = prepare_fly(imgs, half_wnd=wnd // 2, max_dis=d, th=8,
                           tw=128, wgt_imgs_u8=lab)
        assert prep.data_ch0 == 3
        got = fly_plane_cost_prepared(prep, abc, half_wnd=wnd // 2,
                                      max_dis=d, gamma=10.0, th=8, tw=128)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
            lab, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_fly_lab_weights_image_lerp_matches_literal_interpret():
    """Lab ASW weights + the literal image-space lerp mode vs the jnp
    grd_fly_cost authority with ref_wgt (the exact configuration the
    round-4 kernel rejected)."""
    from crossscalepatchmatch_tpu.ops.color import bgr_to_lab_u8
    from crossscalepatchmatch_tpu.ops.onthefly_cost import (grd_fly_cost,
                                                            gray_gradient)
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        fly_plane_cost_prepared, prepare_fly)

    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(13)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    lab = bgr_to_lab_u8(imgs)
    grd = gray_gradient(imgs)
    abc = _plane_batch(k3, 3, h, w, d)

    with pltpu.force_tpu_interpret_mode():
        prep = prepare_fly(imgs, half_wnd=wnd // 2, max_dis=d, th=8,
                           tw=128, lerp="image", wgt_imgs_u8=lab)
        got = fly_plane_cost_prepared(prep, abc, half_wnd=wnd // 2,
                                      max_dis=d, gamma=10.0, th=8, tw=128)
    kw = dict(half_wnd=wnd // 2, max_dis=d, gamma=10.0)
    want = jnp.stack([
        grd_fly_cost(imgs[0], imgs[1], grd[0], grd[1], abc[0], sign=-1,
                     ref_wgt=lab[0], **kw),
        grd_fly_cost(imgs[1], imgs[0], grd[1], grd[0], abc[1], sign=+1,
                     ref_wgt=lab[1], **kw)])
    # atol: see test_fly_image_lerp_matches_literal_grd_pc_interpret
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-3)


@pytest.mark.slow
def test_fly_cs_lab_weights_matches_literal_interpret():
    """Cross-scale fly + per-level Lab weight slabs (cspc.cc:48-49) vs
    the jnp cs_fly_cost authority with pyr_wgt_ref."""
    from crossscalepatchmatch_tpu.ops.color import bgr_to_lab_u8
    from crossscalepatchmatch_tpu.ops.onthefly_cost import (cs_fly_cost,
                                                            gray_gradient)
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        cross_scale_fly_cost_prepared, prepare_cross_scale_fly)
    from crossscalepatchmatch_tpu.ops.pyramid import build_pyramid

    h, w, d, wnd, levels = 32, 48, 12, 5, 2
    key = jax.random.PRNGKey(17)
    k1, k3 = jax.random.split(key)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    l_pyr = build_pyramid(imgs[0], levels)
    r_pyr = build_pyramid(imgs[1], levels)
    l_grd = [gray_gradient(im) for im in l_pyr]
    r_grd = [gray_gradient(im) for im in r_pyr]
    pyr_imgs = [jnp.stack([l_pyr[s], r_pyr[s]]) for s in range(levels)]
    pyr_lab = [bgr_to_lab_u8(im) for im in pyr_imgs]
    wgts = (0.6, 0.4)
    abc = _plane_batch(k3, 2, h, w, d, spread=0.5)

    with pltpu.force_tpu_interpret_mode():
        preps = prepare_cross_scale_fly(pyr_imgs, half_wnd=wnd // 2,
                                        max_dis=d, th=8, tw=128,
                                        lerp="image", vd_wgt_imgs=pyr_lab)
        got = cross_scale_fly_cost_prepared(
            preps, wgts, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)
    kw = dict(half_wnd=wnd // 2, max_dis=d, gamma=10.0)
    want = jnp.stack([
        cs_fly_cost(l_pyr, r_pyr, l_grd, r_grd, wgts, abc[0], sign=-1,
                    pyr_wgt_ref=[im[0] for im in pyr_lab], **kw),
        cs_fly_cost(r_pyr, l_pyr, r_grd, l_grd, wgts, abc[1], sign=+1,
                    pyr_wgt_ref=[im[1] for im in pyr_lab], **kw)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-3)


def test_kernel_bf16_volume_close_to_f32_interpret():
    """vol_dtype="bf16" (round 5): the kernel contracts a bf16-stored
    volume with f32 accumulation.  Tolerance is the bf16 mantissa bound
    on the stored slice values (2^-9 relative), NOT exactness -- the
    element-exact contract stays with f32."""
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        prepare_volumes, window_plane_cost_prepared)

    h, w, d, wnd = 24, 40, 8, 5
    key = jax.random.PRNGKey(21)
    k1, k2, k3 = jax.random.split(key, 3)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32) * 2.8
    mc = jnp.max(vols, axis=(1, 2, 3))
    abc = _plane_batch(k3, 3, h, w, d)

    with pltpu.force_tpu_interpret_mode():
        prep = prepare_volumes(imgs, vols, half_wnd=wnd // 2, th=8,
                               tw=128, vol_dtype=jnp.bfloat16)
        assert prep.vol_p.dtype == jnp.bfloat16
        assert prep.vol_p.shape[2] % 16 == 0
        got = window_plane_cost_prepared(
            prep, mc, abc, half_wnd=wnd // 2, max_dis=d, gamma=10.0,
            th=8, tw=128)
    want = jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0))(
            imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-3, atol=4e-3)
