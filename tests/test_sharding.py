"""Multi-chip SPMD tests on the 8-device virtual CPU mesh: 1-chip vs
N-chip bitwise render invariance, sharded gradient correctness, and the
full sharded recovery step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.parallel.shard import (
    make_mesh,
    make_recover_step,
    render_image_sharded,
    render_samples_sharded,
)
from inverse_path_tracer_tpu.render.forward import render_samples


CFG = RenderConfig(width=16, height=16, spp=4, max_bounces=4, tile_size=128)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_render_matches_single_chip(cornell_scene, n_dev):
    key = jax.random.PRNGKey(0)
    ref, ref_stats = render_samples(cornell_scene.diffuse, cornell_scene, key, CFG)
    mesh = make_mesh(n_dev)
    got, stats = render_samples_sharded(
        cornell_scene.diffuse, cornell_scene, key, CFG, mesh
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # Stats are global (psum'd): padded lanes are dead so counts match.
    assert float(stats.segments) == float(ref_stats.segments)


def test_sharded_gradient_matches_single_chip(cornell_scene):
    key = jax.random.PRNGKey(1)
    mesh = make_mesh(8)
    target = jnp.zeros((CFG.height, CFG.width, 3))

    from inverse_path_tracer_tpu.render.forward import render_image
    from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean

    def single_loss(theta):
        mats = jax.nn.sigmoid(theta)
        img = render_image(mats, cornell_scene, key, CFG)
        return jnp.mean(jnp.abs(img - target))

    theta = jnp.zeros_like(cornell_scene.diffuse)
    g_single = jax.grad(single_loss)(theta)

    # The sharded step with SGD lr=1: theta' = theta - g  => g = theta - theta'.
    opt = optax.sgd(1.0)
    step = make_recover_step(cornell_scene, CFG, mesh, opt)
    theta2, _, loss = step(theta, opt.init(theta), key, target)
    g_sharded = theta - theta2
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(float(loss), float(single_loss(theta)), rtol=1e-6)


def test_recover_step_decreases_loss(cornell_scene):
    """A few sharded Adam steps toward a rendered target reduce the loss."""
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(2)
    from inverse_path_tracer_tpu.render.forward import render_image

    target = render_image(cornell_scene.diffuse, cornell_scene, key, CFG)
    opt = optax.adam(0.1)
    step = make_recover_step(cornell_scene, CFG, mesh, opt)
    theta = jnp.zeros_like(cornell_scene.diffuse)
    state = opt.init(theta)
    losses = []
    for i in range(5):
        theta, state, loss = step(theta, state, key, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_tile_rng_invariant_warning(cornell_scene):
    """tile_size > per-device sample count breaks the N-chip == 1-chip
    RNG invariant; the sharded entry points must warn (CLAUDE.md
    invariant, enforced instead of silent)."""
    import warnings

    from inverse_path_tracer_tpu.parallel.shard import TileRNGInvariantWarning

    key = jax.random.PRNGKey(0)
    big_tile = CFG.with_(tile_size=1 << 16)  # 1024 samples / 8 dev = 128 < 65536
    with pytest.warns(TileRNGInvariantWarning):
        render_samples_sharded(
            cornell_scene.diffuse, cornell_scene, key, big_tile, make_mesh(8)
        )
    # The aligned config stays silent.
    with warnings.catch_warnings():
        warnings.simplefilter("error", TileRNGInvariantWarning)
        render_samples_sharded(
            cornell_scene.diffuse, cornell_scene, key, CFG, make_mesh(8)
        )


def test_pallas_block_divides_tile(cornell_scene):
    """_pallas_block must return a divisor of the tile bounded by the
    VMEM budget — never silently widen to a huge non-power-of-two tile —
    and reject tiles that no >=128 block divides."""
    from inverse_path_tracer_tpu.render.forward import _pallas_block

    b = _pallas_block(cornell_scene, 1 << 16)
    assert (1 << 16) % b == 0 and b <= 8192
    # Non-power-of-two tile: block stays a legal (lane-aligned) divisor.
    b = _pallas_block(cornell_scene, 128 * 3)
    assert (128 * 3) % b == 0 and b % 128 == 0
    b = _pallas_block(cornell_scene, 128 * 5 * 64)  # 40960: not a power of 2
    assert (128 * 5 * 64) % b == 0 and b % 128 == 0 and b <= 8192
    with pytest.raises(ValueError, match="multiple of 128"):
        _pallas_block(cornell_scene, 100 * 100)
