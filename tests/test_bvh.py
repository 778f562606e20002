"""BVH build + traversal vs the brute-force oracle (SURVEY.md §7.4:
'the brute-force path kept as a reference oracle')."""

import numpy as np
import jax.numpy as jnp
import pytest

from inverse_path_tracer_tpu.ops.bvh import build_bvh, intersect_bvh
from inverse_path_tracer_tpu.ops.intersect import intersect_brute
from inverse_path_tracer_tpu.scene.build import build_scene
from inverse_path_tracer_tpu.scene.dsl import ObjectParams

REF = "/root/reference"


def _random_rays(n, seed, origin=(0, 0, 0), spread=1.0):
    rng = np.random.default_rng(seed)
    p = jnp.asarray(
        rng.uniform(-spread, spread, size=(n, 3)) + np.asarray(origin),
        dtype=jnp.float32,
    )
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return p, jnp.asarray(d, dtype=jnp.float32)


def _check_matches_brute(scene, p, d):
    a = intersect_brute(scene, p, d)
    b = intersect_bvh(scene, build_bvh(scene), p, d)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hits = np.asarray(a.hit)
    np.testing.assert_allclose(
        np.asarray(a.t)[hits], np.asarray(b.t)[hits], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(a.tri)[hits], np.asarray(b.tri)[hits])


def test_bvh_structure(cornell_scene):
    bvh = build_bvh(cornell_scene)
    # Covers all 30 triangles exactly once.
    assert sorted(np.asarray(bvh.tri_order).tolist()) == list(range(30))
    n_prims = np.asarray(bvh.n_prims)
    leaves = n_prims > 0
    assert n_prims[leaves].sum() == 30
    assert (n_prims[leaves] <= 4).all()
    # Root bbox covers the scene.
    np.testing.assert_allclose(np.asarray(bvh.bbox_min[0]), [-2, -2, 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(bvh.bbox_max[0]), [2, 2, 6], atol=1e-5)


def test_bvh_matches_brute_cornell(cornell_scene):
    p, d = _random_rays(512, 0, origin=(0, 0, 4), spread=1.8)
    _check_matches_brute(cornell_scene, p, d)


def test_bvh_matches_brute_from_camera(cornell_scene):
    p = jnp.zeros((256, 3))
    _, d = _random_rays(256, 1)
    # Point rays into the box.
    d = jnp.stack([d[:, 0] * 0.5, d[:, 1] * 0.5, jnp.abs(d[:, 2]) + 0.5], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    _check_matches_brute(cornell_scene, p, d)


def test_bvh_sphere_1280_tris():
    params = ObjectParams(
        pos=(0, 0, 4),
        obj_file=f"{REF}/shapes/sphere.obj",
        mtl_file="*Kd 0.5 0.5 0.5*",
    )
    scene = build_scene([params])
    assert scene.n_tri == 1280
    bvh = build_bvh(scene)
    assert bvh.n_nodes > 100  # a real tree, not one leaf
    p, d = _random_rays(256, 2, origin=(0, 0, 4), spread=2.0)
    _check_matches_brute(scene, p, d)

def test_render_with_bvh_matches_brute():
    """cfg.intersect="bvh" renders the sphere scene identically to the
    dense sweep (same RNG; only the intersector changes)."""
    import jax
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.ops.bvh import attach_bvh
    from inverse_path_tracer_tpu.render.forward import render_samples
    from inverse_path_tracer_tpu.scene.build import build_scene
    from inverse_path_tracer_tpu.scene.dsl import ObjectParams

    scene = build_scene(
        [
            ObjectParams(
                pos=(0, 0, 4),
                scl=(2, 2, 2),
                obj_file="/root/reference/CornellBox/CornellBox-Empty-CO.obj",
                mtl_file="/root/reference/CornellBox/CornellBox-Empty-CO.mtl",
            ),
            ObjectParams(
                pos=(0, -1.5, 4),
                obj_file="/root/reference/shapes/sphere.obj",
                mtl_file="*Kd 0.6 0.6 0.6*",
            ),
        ]
    )
    scene_b = attach_bvh(scene)
    key = jax.random.PRNGKey(0)
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=3, tile_size=128)
    a, sa = render_samples(scene.diffuse, scene, key, cfg)
    b, sb = render_samples(
        scene_b.diffuse, scene_b, key, cfg.with_(intersect="bvh")
    )
    assert float(sa.segments) == float(sb.segments)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
