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

CFG = RenderConfig(fast_recip=False, width=16, height=16, spp=4, max_bounces=6, tile_size=1024)


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
    """Smooth-shaded scenes (vn) accumulate matching transport grids:
    the kernel interpolates getNormal in-VMEM like the XLA oracle.
    The sphere is past the clustered threshold, so this now exercises
    the records-mode path (HBM edge stream + sort/segment reduction).

    A handful of grid cells may differ: curved-geometry grazing hits
    resolve within an ulp and the winning triangle is
    compilation-dependent (see render_kernel.kernel_perm NOTE), which
    moves whole edges between (dst, src) bins.  Bound the flips and
    compare the bulk."""
    from tests.test_pallas import _sphere_scene

    scene = _sphere_scene()
    key = jax.random.PRNGKey(5)
    cfg = RenderConfig(fast_recip=False, width=8, height=8, spp=2, max_bounces=3, tile_size=128)
    ref = _grids(scene, cfg, key)
    got = _grids(scene, cfg.with_(backend="pallas"), key)
    cnt_diff = np.asarray(got.count) != np.asarray(ref.count)
    assert cnt_diff.sum() <= 12, f"{cnt_diff.sum()} count cells differ"
    w_ok = np.isclose(np.asarray(got.w_sum), np.asarray(ref.w_sum),
                      rtol=1e-4, atol=1e-3)
    assert (~w_ok).sum() <= 12, f"{(~w_ok).sum()} w cells differ"
    np.testing.assert_allclose(
        float(got.w_sum.sum()), float(ref.w_sum.sum()), rtol=1e-3
    )
    p_ok = np.isclose(np.asarray(got.pixel_sum[:, 0]),
                      np.asarray(ref.pixel_sum[:, 0]), rtol=1e-4, atol=1e-3)
    assert (~p_ok).sum() <= 36, f"{(~p_ok).sum()} pixel cells differ"


def test_pallas_inverse_requires_p_spec_zero(cornell_scene):
    """p_spec > 0 silently falls back to the XLA path (same result)."""
    key = jax.random.PRNGKey(3)
    cfg = CFG.with_(p_spec=0.25)
    ref = _grids(cornell_scene, cfg, key)
    got = _grids(cornell_scene, cfg.with_(backend="pallas"), key)
    np.testing.assert_array_equal(np.asarray(got.w_sum), np.asarray(ref.w_sum))


def _many_cube_scene():
    """Cornell + 42 cubes = 522 triangles: a flat-shaded scene past the
    clustered threshold (padded Tp >= 512), so the records-mode inverse
    kernel (HBM edge stream + XLA sort/segment reduction) engages
    instead of the dense VMEM accumulator."""
    from inverse_path_tracer_tpu.scene.build import build_scene
    from inverse_path_tracer_tpu.scene.dsl import ObjectParams

    REF = "/root/reference"
    objs = [
        ObjectParams(pos=(0, 0, 4), scl=(2, 2, 2),
                     obj_file=f"{REF}/CornellBox/CornellBox-Empty-CO.obj",
                     mtl_file=f"{REF}/CornellBox/CornellBox-Empty-CO.mtl")
    ]
    rng = np.random.default_rng(3)
    for i in range(42):
        x = float(rng.uniform(-1.2, 1.2))
        y = float(rng.uniform(-1.2, 1.2))
        z = float(rng.uniform(2.8, 5.2))
        kd = rng.uniform(0.1, 0.9, 3)
        objs.append(ObjectParams(
            pos=(x, y, z), scl=(0.25, 0.25, 0.25),
            obj_file=f"{REF}/shapes/cube.obj",
            mtl_file=f"*Kd {kd[0]:.3f} {kd[1]:.3f} {kd[2]:.3f}*",
        ))
    return build_scene(objs)


def test_records_inverse_matches_xla_clustered():
    """Large-scene (records-mode) extraction == the XLA oracle: the
    fused trace consumes identical threefry uniforms, and the
    sort/segment reduction must reproduce the oracle's grid to float
    tolerance (cumsum vs matmul reduction order)."""
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import cluster_k_for

    scene = _many_cube_scene()
    cfg = RenderConfig(fast_recip=False, width=16, height=16, spp=2, max_bounces=4,
                       tile_size=512, rng="external")
    assert cluster_k_for(scene.vertices.shape[0], cfg) > 0
    key = jax.random.PRNGKey(0)
    img = jnp.tile(
        jnp.linspace(0.0, 1.0, cfg.width)[None, :, None],
        (cfg.height, 1, 3),
    )
    ref = trace_transport_range(scene, img, key, cfg, jnp.int32(0),
                                cfg.n_samples)
    got = trace_transport_range(scene, img, key,
                                cfg.with_(backend="pallas"),
                                jnp.int32(0), cfg.n_samples)
    np.testing.assert_allclose(np.asarray(got.count), np.asarray(ref.count),
                               atol=0.5)
    # atol = the documented cumsum-cancellation floor of the segment
    # reduction: ~eps * (tile edge-weight total) of absolute noise on
    # near-zero bins (M = 2*bounces*tile edges here -> ~3e-4).
    np.testing.assert_allclose(
        np.asarray(got.w_sum), np.asarray(ref.w_sum), rtol=2e-4, atol=1e-3
    )
    for name in ("pixel_sum", "light_sum", "factors_sum"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)[:, 0]),
            np.asarray(getattr(ref, name)[:, 0]),
            rtol=2e-4, atol=1e-3, err_msg=name,
        )
    # compress round-trips
    w1, p1, l1 = compress_grids(ref, scene.n_tri)
    w2, p2, l2 = compress_grids(got, scene.n_tri)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                               rtol=1e-3, atol=5e-4)
