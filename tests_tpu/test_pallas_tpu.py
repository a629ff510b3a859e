"""Element-exactness of the fused window-cost kernel on real TPU hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU")


def _mk(h, w, d, k, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    imgs = jax.random.randint(k1, (2, h, w, 3), 0, 255, jnp.uint8)
    vols = jax.random.uniform(k2, (2, h, w, d + 1), jnp.float32)
    mc = jnp.max(vols, axis=(1, 2, 3))
    ab = jax.random.uniform(k3, (2, k, h, w, 2), jnp.float32, -1, 1)
    dc = jax.random.uniform(k3, (2, k, h, w), jnp.float32, 0, d)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    c = dc - ab[..., 0] * xs - ab[..., 1] * ys
    return imgs, vols, mc, jnp.concatenate([ab, c[..., None]], axis=-1)


@pytest.mark.parametrize("h,w,d,wnd,k", [
    (128, 128, 16, 9, 1),
    (128, 188, 60, 35, 4),
    (96, 130, 20, 35, 2),     # non-tile-multiple shapes
])
def test_kernel_exact_vs_jnp(h, w, d, wnd, k):
    from crossscalepatchmatch_tpu.ops.pallas.window_cost import (
        window_plane_cost_pallas)
    from crossscalepatchmatch_tpu.ops.plane_cost import window_plane_cost

    imgs, vols, mc, abc = _mk(h, w, d, k)
    got = window_plane_cost_pallas(imgs, vols, mc, abc, half_wnd=wnd // 2,
                                   max_dis=d, gamma=10.0)
    want = jax.jit(jax.vmap(lambda i, v, m, a: window_plane_cost(
        i, v, m, a, half_wnd=wnd // 2, max_dis=d, gamma=10.0)))(
            imgs, vols, mc, abc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_runs_with_kernel():
    from crossscalepatchmatch_tpu import CSPMConfig, CostMethod
    from crossscalepatchmatch_tpu.data import make_pair
    from crossscalepatchmatch_tpu.metrics import bad_pixel_rate
    from crossscalepatchmatch_tpu.models.pipeline import run_pair_np

    pair = make_pair(h=96, w=128, max_dis=16, seed=5)
    cfg = CSPMConfig(max_dis=16, dis_scale=8, wnd_size=19)
    out = run_pair_np(pair.left, pair.right, cfg, seed=0)
    disp = out["dis"][0].astype(np.float32) / cfg.dis_scale
    bad = bad_pixel_rate(disp, pair.disp_left, pair.valid_left, 1.0)
    assert bad < 0.1, bad
