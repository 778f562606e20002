"""Ray-scene intersection as batched dense linear algebra.

The reference's BVH (bvh.h) is built over *Objects* with leafSize=4; its
scenes have <= 2 objects, so the tree degenerates to one leaf and every
intersection is a brute-force scan of all triangles
(bvh.h:65-77 -> scene_basics.h:426-459).  On TPU the same brute-force
sweep is the speed-of-light design for small scenes: every per-(ray,
triangle) quantity is a (R,3)x(3,T) matmul or a broadcast VPU op, with no
divergent traversal.  A BVH path for large scenes lives in ops/bvh.py.

Intersection contract (reference scene_basics.h:426-459):
  * plane test: reject |n.d| < MIN_DOT (1e-4);
  * t = (p - center).n / -(n.d); reject t < EPSILON (1e-2);
  * inside test: signed distance to the 3 edge planes
    (scene_basics.h:497-503), reject if any sd > 0;
  * nearest t wins; exact ties keep the lowest triangle index (the
    reference's scan order).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from inverse_path_tracer_tpu.scene.build import SceneData


class Intersection(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (inf on miss)
    tri: jnp.ndarray  # (R,) int32 triangle index (clamped-to-0 on miss; use .hit)
    point: jnp.ndarray  # (R, 3) hit point (p + t*d; p on miss)
    hit: jnp.ndarray  # (R,) bool


def intersect_brute(
    scene: SceneData,
    p: jnp.ndarray,
    d: jnp.ndarray,
    min_dot: float = 1e-4,
    epsilon: float = 1e-2,
) -> Intersection:
    """Intersect R rays against all nT triangles; O(R*T) dense sweep."""
    n = scene.face_normal  # (T, 3)
    denom = d @ n.T  # (R, T)
    pn = p @ n.T  # (R, T)
    cn = jnp.sum(scene.center * n, axis=-1)  # (T,)
    t = (pn - cn[None, :]) / (-denom)

    inside = (jnp.abs(denom) >= min_dot) & (t >= epsilon)
    for j in range(3):
        oj = scene.edge_out[:, j, :]  # (T, 3)
        dj = scene.edge_d[:, j]  # (T,)
        sd = (p @ oj.T) + t * (d @ oj.T) + dj[None, :]
        inside = inside & (sd <= 0.0)

    t_masked = jnp.where(inside, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_masked, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
    hit = jnp.isfinite(t_best)
    t_safe = jnp.where(hit, t_best, 0.0)
    point = p + d * t_safe[:, None]
    return Intersection(t=t_best, tri=jnp.where(hit, idx, 0), point=point, hit=hit)


def intersect_fast(
    scene: SceneData,
    p: jnp.ndarray,
    d: jnp.ndarray,
    min_dot: float = 1e-4,
    epsilon: float = 1e-2,
) -> Intersection:
    """Same contract as intersect_brute, restructured for the TPU:
    all eight (R,3)x(3,T) sweeps collapse into two (R,4)x(4,4T) matmuls
    against the packed homogeneous plane matrix (SceneData.plane_mat),
    and the min/argmin run over one fused (R,T) mask."""
    n_t = scene.vertices.shape[0]
    ones = jnp.ones_like(p[:, :1])
    p4 = jnp.concatenate([p, ones], axis=-1)  # (R, 4)
    d4 = jnp.concatenate([d, ones * 0.0], axis=-1)

    a = (p4 @ scene.plane_mat).reshape(-1, n_t, 4)  # (R, T, 4)
    b = (d4 @ scene.plane_mat).reshape(-1, n_t, 4)

    denom = b[..., 0]
    t = a[..., 0] / (-denom)
    inside = (jnp.abs(denom) >= min_dot) & (t >= epsilon)
    sd = a[..., 1:] + t[..., None] * b[..., 1:]  # (R, T, 3)
    inside = inside & jnp.all(sd <= 0.0, axis=-1)

    t_masked = jnp.where(inside, t, jnp.inf)
    t_best = jnp.min(t_masked, axis=1)
    idx = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    hit = jnp.isfinite(t_best)
    t_safe = jnp.where(hit, t_best, 0.0)
    point = p + d * t_safe[:, None]
    return Intersection(t=t_best, tri=jnp.where(hit, idx, 0), point=point, hit=hit)


def intersect_onehot(
    scene: SceneData,
    p: jnp.ndarray,
    d: jnp.ndarray,
    min_dot: float = 1e-4,
    epsilon: float = 1e-2,
):
    """intersect_fast + a one-hot hit-selection matrix sel (R, T) f32
    (zero row on miss, ties resolved to the lowest triangle index).

    sel turns every per-hit table lookup into `sel @ table` — a matmul
    instead of a gather.  On TPU this is the difference between MXU work
    and serialized gather/scatter (and the *transpose* of a matmul is a
    matmul, so backward passes stay fast, while a gather transposes to a
    scatter)."""
    n_t = scene.vertices.shape[0]
    ones = jnp.ones_like(p[:, :1])
    p4 = jnp.concatenate([p, ones], axis=-1)
    d4 = jnp.concatenate([d, ones * 0.0], axis=-1)
    a = (p4 @ scene.plane_mat).reshape(-1, n_t, 4)
    b = (d4 @ scene.plane_mat).reshape(-1, n_t, 4)
    denom = b[..., 0]
    t = a[..., 0] / (-denom)
    inside = (jnp.abs(denom) >= min_dot) & (t >= epsilon)
    sd = a[..., 1:] + t[..., None] * b[..., 1:]
    inside = inside & jnp.all(sd <= 0.0, axis=-1)

    t_masked = jnp.where(inside, t, jnp.inf)
    t_best = jnp.min(t_masked, axis=1)
    hit = jnp.isfinite(t_best)
    m = inside & (t_masked == t_best[:, None])
    m = m & (jnp.cumsum(m, axis=1) == 1)  # first occurrence on exact ties
    sel = m.astype(p.dtype)
    idx = jnp.argmax(m, axis=1).astype(jnp.int32)
    t_safe = jnp.where(hit, t_best, 0.0)
    point = p + d * t_safe[:, None]
    isect = Intersection(t=t_best, tri=jnp.where(hit, idx, 0), point=point, hit=hit)
    return isect, sel


def _safe_normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Eigen normalize(): no-op on zero vectors (MatrixBase::normalize
    guards squaredNorm() > 0)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), v)


def smooth_normal(scene: SceneData, tri: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Barycentric-interpolated shading normal
    (reference Triangle::getNormal scene_basics.h:100-109):
    w_i = 0.5 * |cross(v_{i+1} - p, v_{i+2} - p)| / area;
    normal = normalize(sum_i w_i * n_i).

    For meshes without vertex normals all n_i equal the face normal, so
    this returns the face normal exactly — and the scene builder signals
    that case statically with an empty (nT, 0, 3) normals array, letting
    the whole interpolation compile away to one gather."""
    if scene.vertex_normals.shape[1] == 0:
        return scene.face_normal[tri]
    v = scene.vertices[tri]  # (R, 3, 3)
    ns = scene.vertex_normals[tri]  # (R, 3, 3)
    area = scene.area[tri]  # (R,)
    ws = []
    for i in range(3):
        c = jnp.cross(v[:, (i + 1) % 3] - point, v[:, (i + 2) % 3] - point)
        ws.append(0.5 * jnp.linalg.norm(c, axis=-1) / area)
    w = jnp.stack(ws, axis=-1)  # (R, 3)
    normal = jnp.einsum("ric,ri->rc", ns, w)
    return _safe_normalize(normal)
