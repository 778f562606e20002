"""Unit tests for geometry/sampling ops against hand-computed values."""

import numpy as np
import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.ops.intersect import (
    intersect_brute,
    intersect_fast,
    smooth_normal,
)
from inverse_path_tracer_tpu.ops.sampling import (
    rotate_z_to,
    sample_next_dir,
    pick_emissive,
    sample_emissive_point,
)
from inverse_path_tracer_tpu.ops.bsdf import specular_coeff
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean, tonemap_to_uint8


def test_intersect_floor(cornell_scene):
    # Ray from origin, straight at the back wall through the box center.
    p = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 1.0]])
    isect = intersect_brute(cornell_scene, p, d)
    assert bool(isect.hit[0])
    # First surface along +z from origin: the cube's front face at
    # z = 4 - 0.5 = 3.5 (cube half-width .5 at (0,-1.5,4))? No: the ray
    # passes at y=0, the cube spans y in [-2,-1]; so the hit is the back
    # wall at z = 6.
    np.testing.assert_allclose(float(isect.t[0]), 6.0, rtol=1e-5)


def test_intersect_cube_top(cornell_scene):
    # Straight down onto the cube top (y = -1) from inside the box.
    p = jnp.array([[0.0, 0.0, 4.0]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    isect = intersect_brute(cornell_scene, p, d)
    assert bool(isect.hit[0])
    np.testing.assert_allclose(float(isect.t[0]), 1.0, rtol=1e-5)
    assert int(isect.tri[0]) >= 18  # a cube triangle


def test_intersect_epsilon_cutoff(cornell_scene):
    # A hit closer than EPSILON=1e-2 is rejected (scene_basics.h:444):
    # start 5e-3 in front of the back wall.
    p = jnp.array([[0.0, 0.0, 5.995]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    isect = intersect_brute(cornell_scene, p, d)
    assert not bool(isect.hit[0])


def test_intersect_miss(cornell_scene):
    # Ray pointing away from the scene (camera at origin, scene at z>2).
    p = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, -1.0]])
    isect = intersect_brute(cornell_scene, p, d)
    assert not bool(isect.hit[0])
    assert np.isinf(float(isect.t[0]))


def test_intersect_fast_matches_brute(cornell_scene):
    """The 2-matmul homogeneous intersector is the oracle-checked twin of
    the 8-matmul brute sweep."""
    import jax

    rng = np.random.default_rng(3)
    p = jnp.asarray(
        rng.uniform(-1.5, 1.5, size=(512, 3)) + np.array([0, 0, 4.0]),
        dtype=jnp.float32,
    )
    d = rng.normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, dtype=jnp.float32)
    a = intersect_brute(cornell_scene, p, d)
    b = intersect_fast(cornell_scene, p, d)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hits = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(a.tri)[hits], np.asarray(b.tri)[hits])
    np.testing.assert_allclose(
        np.asarray(a.t)[hits], np.asarray(b.t)[hits], rtol=1e-5
    )


def test_smooth_normal_flat(cornell_scene):
    # Flat meshes: smooth normal == face normal everywhere.
    p = jnp.array([[0.1, -1.9, 3.9]])
    tri = jnp.array([0], dtype=jnp.int32)
    n = smooth_normal(cornell_scene, tri, p)
    np.testing.assert_allclose(
        np.asarray(n)[0], np.asarray(cornell_scene.face_normal)[0], atol=1e-5
    )


def test_rotate_z_to_identity_and_flip():
    v = jnp.array([[0.3, 0.4, 0.5]])
    up = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(rotate_z_to(up, v)), np.asarray(v), atol=1e-6)
    down = jnp.array([[0.0, 0.0, -1.0]])
    np.testing.assert_allclose(np.asarray(rotate_z_to(down, v)), -np.asarray(v), atol=1e-6)


def test_rotate_z_to_maps_z_to_normal():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, dtype=jnp.float32)
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (64, 3))
    got = rotate_z_to(n, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(n), atol=1e-5)
    # Rotation preserves norms for arbitrary vectors.
    v = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
    got = rotate_z_to(n, v)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(got), axis=-1),
        np.linalg.norm(np.asarray(v), axis=-1),
        rtol=1e-5,
    )


def test_sample_next_dir_diffuse_distribution():
    key = jax.random.PRNGKey(0)
    n = 20000
    u1 = jax.random.uniform(key, (n,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    d, pdf = sample_next_dir(normal, jnp.zeros(n, bool), jnp.ones(n), u1, u2)
    # All in the upper hemisphere around +y.
    cos = np.asarray(jnp.sum(d * normal, axis=-1))
    assert (cos >= -1e-6).all()
    # cos(theta) = sqrt(u) => E[cos] = 2/3 for the reference's sampler.
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / np.pi)


def test_pick_emissive_and_point(cornell_scene):
    u = jnp.array([0.1, 0.6, 0.999])
    tri, p_t = pick_emissive(cornell_scene, u)
    # Two equal-area light tris: CDF = [.5, 1].
    assert tri.tolist() == [16, 17, 17]
    np.testing.assert_allclose(np.asarray(p_t), 0.5)
    pt = sample_emissive_point(
        cornell_scene, tri, jnp.array([0.3, 0.5, 0.9]), jnp.array([0.2, 0.5, 0.8])
    )
    # Light points lie on the y=2 plane (ceiling light, scaled box).
    np.testing.assert_allclose(np.asarray(pt)[:, 1], 2.0, atol=1e-5)


def test_specular_coeff_matches_phong():
    n = jnp.array([10.0])
    normal = jnp.array([[0.0, 0.0, 1.0]])
    w_i = jnp.array([[0.0, 0.0, 1.0]])  # straight down the normal
    w = jnp.array([[0.0, 0.0, 1.0]])  # mirror direction
    c = specular_coeff(n, normal, w, w_i)
    np.testing.assert_allclose(float(c[0]), 12.0 / 2.0 / np.pi, rtol=1e-6)
    # Negative base -> 0 (CUDA fmaxf(NaN, 0) = 0 semantics).
    w_back = jnp.array([[0.0, 0.0, -1.0]])
    c = specular_coeff(n, normal, w_back, w_i)
    assert float(c[0]) == 0.0


def test_tonemap():
    samples = jnp.ones((8, 3)) * jnp.array([0.0, 1.0, 3.0])
    img = tonemap_mean(samples, spp=4)
    np.testing.assert_allclose(np.asarray(img), [[0, 0.5, 0.75], [0, 0.5, 0.75]])
    u8 = tonemap_to_uint8(img)
    assert u8.dtype == jnp.uint8
    assert u8.tolist() == [[0, 127, 191], [0, 127, 191]]
