"""Fused Pallas inverse (transport-graph) kernel vs the XLA oracle.

Both consume identical threefry uniforms (external mode on CPU), so the
accumulated edge grids must agree to float tolerance (matmul reduction
order only).  Reference semantics: inv_path_trace.cu / inv_scene.h."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.inverse import (
    compress_grids,
    trace_transport_range,
)
from inverse_path_tracer_tpu.ops.pallas.render_kernel import pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(), reason="no pallas")

CFG = RenderConfig(width=16, height=16, spp=4, max_bounces=6, tile_size=1024)


def _grids(cornell_scene, cfg, key):
    img = jnp.tile(
        jnp.linspace(0.0, 1.0, cfg.width)[None, :, None],
        (cfg.height, 1, 3),
    )  # non-uniform target so pixel sums are informative
    return trace_transport_range(
        cornell_scene, img, key, cfg, jnp.int32(0), cfg.n_samples
    )


def test_pallas_inverse_matches_xla(cornell_scene):
    """Exported quantities agree.  The SPECULAR channel is compared only
    for zero-ness elsewhere: the XLA path carries the reference's
    initial factors = {1, 1} into eye-row edges, which the kernel drops
    because compress never reads that channel (see
    inverse_kernel.grids_from_acc)."""
    key = jax.random.PRNGKey(0)
    ref = _grids(cornell_scene, CFG, key)
    got = _grids(cornell_scene, CFG.with_(backend="pallas"), key)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_allclose(
        np.asarray(got.w_sum), np.asarray(ref.w_sum), rtol=1e-4, atol=1e-5
    )
    for name in ("pixel_sum", "light_sum", "factors_sum"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)[:, 0]),
            np.asarray(getattr(ref, name)[:, 0]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=name,
        )


def test_pallas_inverse_specular_channel_zero(cornell_scene):
    got = _grids(
        cornell_scene, CFG.with_(backend="pallas"), jax.random.PRNGKey(1)
    )
    assert float(jnp.abs(got.pixel_sum[:, 1]).max()) == 0.0
    assert float(jnp.abs(got.factors_sum[:, 1]).max()) == 0.0


def test_pallas_inverse_compress_matches(cornell_scene):
    key = jax.random.PRNGKey(2)
    n_tri = cornell_scene.n_tri
    w_r, p_r, l_r = compress_grids(_grids(cornell_scene, CFG, key), n_tri)
    w_g, p_g, l_g = compress_grids(
        _grids(cornell_scene, CFG.with_(backend="pallas"), key), n_tri
    )
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_g), np.asarray(p_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_g), np.asarray(l_r), rtol=1e-4, atol=1e-6)


def test_pallas_inverse_vertex_normal_scene_matches_xla():
    """Smooth-shaded scenes (vn) accumulate identical transport grids:
    the kernel interpolates getNormal in-VMEM like the XLA oracle."""
    from tests.test_pallas import _sphere_scene

    scene = _sphere_scene()
    key = jax.random.PRNGKey(5)
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=3, tile_size=128)
    ref = _grids(scene, cfg, key)
    got = _grids(scene, cfg.with_(backend="pallas"), key)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_allclose(
        np.asarray(got.w_sum), np.asarray(ref.w_sum), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.pixel_sum[:, 0]),
        np.asarray(ref.pixel_sum[:, 0]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_pallas_inverse_requires_p_spec_zero(cornell_scene):
    """p_spec > 0 silently falls back to the XLA path (same result)."""
    key = jax.random.PRNGKey(3)
    cfg = CFG.with_(p_spec=0.25)
    ref = _grids(cornell_scene, cfg, key)
    got = _grids(cornell_scene, cfg.with_(backend="pallas"), key)
    np.testing.assert_array_equal(np.asarray(got.w_sum), np.asarray(ref.w_sum))
