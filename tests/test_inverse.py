"""Transport-graph extraction tests (capability parity with createGraph
inv_path_trace.cu:195-208 + DataWrapper::compress inv_scene.h:87-115)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_image
from inverse_path_tracer_tpu.render.inverse import (
    compress_grids,
    extract_graph,
    trace_transport_range,
)

CFG = RenderConfig(width=32, height=32, spp=8, max_bounces=8, tile_size=2048)


@pytest.fixture(scope="module")
def graph_data(request):
    scene = request.getfixturevalue("cornell_scene")
    key = jax.random.PRNGKey(0)
    img = render_image(scene.diffuse, scene, key, CFG)
    w, pixel, light = jax.jit(extract_graph, static_argnums=(3,))(
        scene, img, jax.random.PRNGKey(1), CFG
    )
    return scene, np.asarray(img), np.asarray(w), np.asarray(pixel), np.asarray(light)


def test_shapes_and_sanity(graph_data):
    scene, img, w, pixel, light = graph_data
    nt = scene.n_tri
    assert w.shape == (nt + 1, nt)
    assert pixel.shape == (nt + 1, nt, 3)
    assert light.shape == (nt + 1, nt, 3)
    assert not np.isnan(w).any() and not np.isnan(pixel).any() and not np.isnan(light).any()


def test_row_normalization(graph_data):
    _, _, w, _, _ = graph_data
    sums = w.sum(axis=1)
    nonzero = sums > 0
    np.testing.assert_allclose(sums[nonzero], 1.0, rtol=1e-5)
    assert (w >= 0).all()


def test_eye_row_sees_visible_triangles(graph_data):
    scene, img, w, pixel, light = graph_data
    eye = w[-1]
    # Camera looks into the box: most triangles are directly visible
    # (back wall, floor, ceiling, side walls, cube faces toward camera).
    assert (eye > 0).sum() >= 15
    # The floor (tris 0,1) and back wall (10,11) must be visible.
    assert eye[0] > 0 and eye[10] > 0


def test_eye_pixel_colors_match_image(graph_data):
    """Eye-row pixel features are averages of observed pixel colors of
    lanes whose first hit was that triangle — for the (flat-colored)
    back wall the average should sit inside the image's color range."""
    scene, img, w, pixel, light = graph_data
    back_wall_color = pixel[-1, 10]
    assert (back_wall_color > 0.1).all() and (back_wall_color < 1.0).all()


def test_light_edges_carry_emission(graph_data):
    scene, img, w, pixel, light = graph_data
    # NEE edges end at emissive sources 16/17; their light values are a
    # weighted mix of Ke=10 (NEE) and 0 (indirect hits of the light), so
    # strictly positive and <= 10.
    lsum = light[:-1, 16:18].sum(axis=-1)
    assert (lsum > 0).any()
    assert light.max() <= 10.0 + 1e-4
    # Non-emissive sources have zero light.
    np.testing.assert_allclose(light[:, :16], 0.0, atol=1e-6)
    np.testing.assert_allclose(light[:, 18:], 0.0, atol=1e-6)


def test_deterministic(graph_data):
    scene, img, w, pixel, light = graph_data
    w2, p2, l2 = jax.jit(extract_graph, static_argnums=(3,))(
        scene, jnp.asarray(img), jax.random.PRNGKey(1), CFG
    )
    np.testing.assert_array_equal(w, np.asarray(w2))


def test_sharded_grids_sum_to_single(cornell_scene):
    """Transport grids are linear in samples: two half-range traces sum
    to the full-range trace (the multi-chip psum invariant)."""
    img = render_image(cornell_scene.diffuse, cornell_scene, jax.random.PRNGKey(0), CFG)
    key = jax.random.PRNGKey(1)
    total = CFG.n_samples
    half = total // 2
    full = trace_transport_range(cornell_scene, img, key, CFG, jnp.int32(0), total)
    a = trace_transport_range(cornell_scene, img, key, CFG, jnp.int32(0), half)
    b = trace_transport_range(cornell_scene, img, key, CFG, jnp.int32(half), half)
    summed = jax.tree.map(lambda x, y: x + y, a, b)
    for f, s in zip(full, summed):
        np.testing.assert_allclose(np.asarray(f), np.asarray(s), rtol=1e-4, atol=1e-5)


def test_compress_semantics():
    """compress on a hand-built grid: log, factor-normalize, row-normalize
    (inv_scene.h:87-115)."""
    from inverse_path_tracer_tpu.render.inverse import TransportGrids

    nt = 2
    b = (nt + 1) * nt
    w_sum = jnp.array([np.e - 1, 0.0, 0.0, 0.0, np.e**2 - 1, np.e**2 - 1])
    factors = jnp.zeros((b, 2)).at[0, 0].set(2.0).at[4, 0].set(1.0).at[5, 0].set(1.0)
    pixel = jnp.zeros((b, 2, 3)).at[0, 0].set(jnp.array([4.0, 2.0, 0.0]))
    grids = TransportGrids(
        w_sum=w_sum,
        pixel_sum=pixel,
        light_sum=jnp.zeros((b, 2, 3)),
        factors_sum=factors,
        count=jnp.zeros(b),
    )
    w, pix, light = compress_grids(grids, nt)
    # Row 0: [log(e), 0] -> normalized [1, 0]; row 1 zero; row 2 (eye):
    # [2, 2] -> [.5, .5].
    np.testing.assert_allclose(np.asarray(w), [[1, 0], [0, 0], [0.5, 0.5]], atol=1e-6)
    # pixel[0,0] = pixel_sum / factors_sum = [2, 1, 0].
    np.testing.assert_allclose(np.asarray(pix)[0, 0], [2.0, 1.0, 0.0], atol=1e-6)
    # Zero factors -> divide by 1 (no NaN).
    assert not np.isnan(np.asarray(pix)).any()


def test_records_reduction_compensated_at_scale(cornell_scene):
    """The records-path segment reduction must recover SMALL bins
    exactly even when the tile's running cumsum total reaches ~1e13 —
    the round-4 hardware-only NaN bug: plain f32 cumsum boundary
    differences lose everything below ulp(total) ~ 1e6, returning
    large negative garbage for tiny bins (CPU tests at tiny M never
    reached the scale; this one does)."""
    from inverse_path_tracer_tpu.render.inverse import (
        _grids_from_edge_records,
    )

    rng = np.random.default_rng(7)
    b, tile = 16, 65536  # M = 2*b*tile ~ 2M records, like a real tile
    n_tri = cornell_scene.n_tri
    # Indirect edges: almost every record carries a quirk-scale weight
    # (~1e7, like reference-quirk path weights) into high bins; a tiny
    # sprinkle of ~1e-3 weights lands in bin (dst=0, src=1) EARLY in
    # key order so the cumsum prefix above it is ~1e13.
    dst = rng.integers(5, n_tri + 1, size=(b, tile)).astype(np.float32)
    src = rng.integers(0, n_tri, size=(b, tile)).astype(np.float32)
    w = rng.uniform(0.5e7, 1e7, size=(b, tile)).astype(np.float32)
    tiny_rows = np.arange(64)
    dst[0, tiny_rows] = 0.0
    src[0, tiny_rows] = 1.0
    w[0, tiny_rows] = rng.uniform(1e-3, 2e-3, size=64).astype(np.float32)
    hit = np.ones((b, tile), np.float32)
    rec = np.zeros((b, 8, tile), np.float32)
    rec[:, 0] = dst
    rec[:, 1] = src
    rec[:, 2] = hit
    rec[:, 3] = w
    # rows 4..6: nee ok/weight/e_idx all zero -> no NEE edges.
    rec = jnp.asarray(rec.reshape(b * 8, tile))
    pix = jnp.zeros((tile, 3), jnp.float32)

    dense = np.asarray(
        _grids_from_edge_records(rec, pix, cornell_scene,
                                 RenderConfig(width=8, height=8, spp=1,
                                              max_bounces=b), None)
    )
    tiny_bin = 0 * n_tri + 1
    expect = float(np.sum(w[0, tiny_rows].astype(np.float64)))
    got = dense[tiny_bin, 0]
    # Plain f32 cumsum differences would be off by ~ulp(1e13) ~ 1e6;
    # the compensated sum recovers the ~0.1-magnitude bin to ~1e-3.
    assert abs(got - expect) < 1e-2 * expect, (got, expect)
    # And the big bins agree with a float64 reference to f32 rounding.
    keys = (dst * n_tri + src).astype(np.int64)
    big_bin = int(keys[1, 0])
    mask = keys == big_bin
    expect_big = float(np.sum(w.astype(np.float64)[mask]))
    np.testing.assert_allclose(dense[big_bin, 0], expect_big, rtol=1e-5)
