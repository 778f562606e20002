"""Analytic material VJP (render/diff.py) vs plain AD: exact agreement
in both quirk modes, plus finite differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean


BASE = RenderConfig(width=16, height=16, spp=4, max_bounces=8, tile_size=512)


def _grad(scene, cfg, key, weights):
    def loss(mats):
        vals, _ = render_samples(mats, scene, key, cfg)
        return jnp.sum(vals * weights)

    return np.asarray(jax.grad(loss)(scene.diffuse))


@pytest.mark.parametrize("quirks", [True, False])
def test_custom_vjp_matches_ad(cornell_scene, quirks):
    key = jax.random.PRNGKey(3)
    cfg = BASE.with_(reference_quirks=quirks)
    # Non-uniform cotangent exercises every lane weighting.
    weights = jax.random.uniform(jax.random.PRNGKey(9), (cfg.n_samples, 3))
    g_custom = _grad(cornell_scene, cfg.with_(grad_mode="custom"), key, weights)
    g_ad = _grad(cornell_scene, cfg.with_(grad_mode="ad"), key, weights)
    np.testing.assert_allclose(g_custom, g_ad, rtol=2e-4, atol=1e-7)
    assert np.abs(g_custom).sum() > 0


def test_custom_vjp_through_tonemap(cornell_scene):
    """Grad of a realistic loss (tonemapped L1) matches between modes."""
    key = jax.random.PRNGKey(5)
    target = jnp.zeros((BASE.height * BASE.width, 3))

    def loss(mats, cfg):
        vals, _ = render_samples(mats, cornell_scene, key, cfg)
        return jnp.abs(tonemap_mean(vals, cfg.spp) - target).mean()

    g_c = np.asarray(jax.grad(lambda m: loss(m, BASE.with_(grad_mode="custom")))(
        cornell_scene.diffuse))
    g_a = np.asarray(jax.grad(lambda m: loss(m, BASE.with_(grad_mode="ad")))(
        cornell_scene.diffuse))
    np.testing.assert_allclose(g_c, g_a, rtol=2e-4, atol=1e-8)


def test_custom_vjp_finite_difference(cornell_scene):
    cfg = BASE.with_(width=8, height=8, spp=2, max_bounces=4, tile_size=128)
    key = jax.random.PRNGKey(7)

    def loss(m):
        vals, _ = render_samples(m, cornell_scene, key, cfg)
        return (vals**2).mean()

    g = np.asarray(jax.grad(loss)(cornell_scene.diffuse))
    eps = 1e-3
    for tri, ch in [(0, 0), (10, 1), (18, 2), (29, 0)]:
        mp = cornell_scene.diffuse.at[tri, ch].add(eps)
        mm = cornell_scene.diffuse.at[tri, ch].add(-eps)
        fd = (float(loss(mp)) - float(loss(mm))) / (2 * eps)
        assert abs(fd - g[tri, ch]) <= 2e-3 * max(1.0, abs(fd)), (tri, ch, fd, g[tri, ch])


def test_custom_vjp_sharded(cornell_scene):
    """The custom VJP composes with shard_map: sharded step gradient
    equals single-chip (grad_mode=custom on both)."""
    import optax

    from inverse_path_tracer_tpu.parallel.shard import make_mesh, make_recover_step
    from inverse_path_tracer_tpu.render.forward import render_image

    # tile_size must not exceed the per-device sample count, else the
    # effective tile (and hence the tile RNG keys) differ between the
    # single-chip and sharded runs (see parallel/shard.py docstring).
    cfg = BASE.with_(max_bounces=4, tile_size=128)
    key = jax.random.PRNGKey(1)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    def single_loss(theta):
        mats = jax.nn.sigmoid(theta)
        return jnp.mean(jnp.abs(render_image(mats, cornell_scene, key, cfg) - target))

    theta = jnp.zeros_like(cornell_scene.diffuse)
    g_single = jax.grad(single_loss)(theta)
    opt = optax.sgd(1.0)
    step = make_recover_step(cornell_scene, cfg, make_mesh(8), opt)
    theta2, _, _ = step(theta, opt.init(theta), key, target)
    np.testing.assert_allclose(
        np.asarray(theta - theta2), np.asarray(g_single), rtol=1e-5, atol=1e-8
    )
