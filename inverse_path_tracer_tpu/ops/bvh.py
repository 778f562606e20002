"""BVH: host-side builder over *triangles* + device traversal.

The reference's BVH (bvh.h:109-205) is built over whole Objects with
leafSize=4; its scenes have <= 2 objects so the tree is always a single
leaf and traversal degenerates to brute force (SURVEY.md §2.1).  It also
carries two latent bugs the TPU build fixes rather than replicates: the
AABB slab test rejects any box whose per-axis slab excludes the ray
*origin* (scene_basics.h:391-395, dead code in the reference) and the
`todo` stack indexes past its reserved size (bvh.h:116-124).

Here the builder is a numpy midpoint-split over triangle centroids
producing a linearized SoA (bbox_min/max, start, n_prims, right_offset)
with depth-first layout: node i's left child is i+1, right child is
i+right_offset — the reference's flatNode_t layout (bvh.h:6-11), over
triangles instead of objects.

Traversal on TPU: a vmapped, fixed-size-stack while_loop with
near-node-first ordering and early-out (bvh.h:37-107's iterative scheme,
lockstep-masked instead of divergent).  For the asset sizes in this
workload (<= 1280 triangles) the dense intersect_fast sweep is usually
faster on TPU — MXU-friendly matmuls beat divergent traversal — so the
BVH path is opt-in (RenderConfig is unaffected; call intersect_bvh
directly or wire it where scenes grow beyond a few thousand triangles).
The brute-force path doubles as the traversal oracle in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.ops.intersect import Intersection
from inverse_path_tracer_tpu.scene.build import SceneData

MAX_STACK = 64  # matches the reference's traversal_t todo[64] (bvh.h:43)


class BVHData(NamedTuple):
    bbox_min: jnp.ndarray  # (M, 3)
    bbox_max: jnp.ndarray  # (M, 3)
    start: jnp.ndarray  # (M,) int32: first triangle slot (leaves)
    n_prims: jnp.ndarray  # (M,) int32: 0 for inner nodes
    right_offset: jnp.ndarray  # (M,) int32: right child = i + offset
    tri_order: jnp.ndarray  # (nT,) int32 permutation into scene arrays

    @property
    def n_nodes(self) -> int:
        return self.start.shape[0]


def build_bvh(scene: SceneData, leaf_size: int = 4, use_native=None) -> BVHData:
    """Midpoint split on the largest centroid-extent axis (the
    reference's split rule, bvh.h:175-190), recursing over triangles.
    Uses the C++ builder (native/src/ipt_native.cpp) when available;
    both paths are oracle-tested identical."""
    import os as _os

    if use_native is None:
        use_native = not _os.environ.get("IPT_NO_NATIVE")
    if use_native:
        from inverse_path_tracer_tpu.utils import native

        if native.native_available():
            nat = native.build_bvh_native(np.asarray(scene.vertices), leaf_size)
            if nat is not None:
                return BVHData(
                    bbox_min=jnp.asarray(nat["bbox_min"]),
                    bbox_max=jnp.asarray(nat["bbox_max"]),
                    start=jnp.asarray(nat["start"]),
                    n_prims=jnp.asarray(nat["n_prims"]),
                    right_offset=jnp.asarray(nat["right_offset"]),
                    tri_order=jnp.asarray(nat["tri_order"]),
                )
    verts = np.asarray(scene.vertices)  # (nT, 3, 3)
    n_t = verts.shape[0]
    cents = verts.mean(axis=1)
    tri_min = verts.min(axis=1)
    tri_max = verts.max(axis=1)

    order = np.arange(n_t)
    nodes = []  # dicts: bmin, bmax, start, n_prims, right_offset

    def recurse(lo: int, hi: int) -> int:
        idx = len(nodes)
        sel = order[lo:hi]
        bmin = tri_min[sel].min(axis=0)
        bmax = tri_max[sel].max(axis=0)
        node = {
            "bmin": bmin,
            "bmax": bmax,
            "start": lo,
            "n": hi - lo,
            "right": 0,
        }
        nodes.append(node)
        if hi - lo <= leaf_size:
            return idx
        c = cents[sel]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        mid = 0.5 * (c[:, axis].max() + c[:, axis].min())
        left_mask = c[:, axis] < mid
        n_left = int(left_mask.sum())
        if n_left == 0 or n_left == hi - lo:
            n_left = (hi - lo) // 2  # degenerate split: halve
            part = np.argsort(c[:, axis], kind="stable")
        else:
            part = np.argsort(~left_mask, kind="stable")
        order[lo:hi] = sel[part]
        node["n"] = 0  # inner
        recurse(lo, lo + n_left)
        node["right"] = recurse(lo + n_left, hi) - idx
        return idx

    if n_t:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 4 * n_t + 64))
        recurse(0, n_t)
        sys.setrecursionlimit(old)

    return BVHData(
        bbox_min=jnp.asarray(np.stack([n["bmin"] for n in nodes]).astype(np.float32)),
        bbox_max=jnp.asarray(np.stack([n["bmax"] for n in nodes]).astype(np.float32)),
        start=jnp.asarray(np.array([n["start"] for n in nodes], dtype=np.int32)),
        n_prims=jnp.asarray(np.array([n["n"] for n in nodes], dtype=np.int32)),
        right_offset=jnp.asarray(np.array([n["right"] for n in nodes], dtype=np.int32)),
        tri_order=jnp.asarray(order.astype(np.int32)),
    )


def attach_bvh(scene: SceneData, leaf_size: int = 4) -> SceneData:
    """Return the scene with a built BVH in its `bvh` field (consumed by
    the XLA renderer when cfg.intersect == "bvh")."""
    b = build_bvh(scene, leaf_size=leaf_size)
    return scene._replace(bvh=tuple(b))


def _slab_test(bmin, bmax, p, inv_d, best_t):
    """Correct branchless slab AABB test (NOT the reference's
    origin-inside variant, which is dead code; SURVEY.md §3.5(d))."""
    l1 = (bmin - p) * inv_d
    l2 = (bmax - p) * inv_d
    lmin = jnp.minimum(l1, l2)
    lmax = jnp.maximum(l1, l2)
    tmin = jnp.max(lmin)
    tmax = jnp.min(lmax)
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t), tmin


def intersect_bvh(
    scene: SceneData,
    bvh: BVHData,
    p: jnp.ndarray,
    d: jnp.ndarray,
    min_dot: float = 1e-4,
    epsilon: float = 1e-2,
    leaf_size: int = 4,
) -> Intersection:
    """Stack-based iterative traversal (vmapped over rays), matching
    intersect_brute's hit contract exactly on ties via lowest-triangle-
    index preference."""
    verts = scene.vertices
    normal = scene.face_normal
    center = scene.center
    edge_out = scene.edge_out
    edge_d = scene.edge_d
    order = bvh.tri_order

    def one_ray(p1, d1):
        inv_d = 1.0 / d1

        def tri_hit(slot, best_t, best_tri):
            tri = order[slot]
            n1 = normal[tri]
            denom = jnp.dot(n1, d1)
            t = jnp.dot(p1 - center[tri], n1) / (-denom)
            ok = (jnp.abs(denom) >= min_dot) & (t >= epsilon) & (t < best_t)
            point = p1 + d1 * t
            sd = jnp.einsum("jc,c->j", edge_out[tri], point) + edge_d[tri]
            ok = ok & jnp.all(sd <= 0.0)
            # tie-break: strictly-less keeps the first (lowest slot after
            # ordering); to match brute's lowest-global-index rule we
            # also prefer the smaller tri index on exact equality.
            better = ok & ((t < best_t) | ((t == best_t) & (tri < best_tri)))
            return (
                jnp.where(better, t, best_t),
                jnp.where(better, tri, best_tri),
            )

        def body(state):
            stack, sp, best_t, best_tri = state
            sp = sp - 1
            node = stack[sp]
            hit_box, _ = _slab_test(
                bvh.bbox_min[node], bvh.bbox_max[node], p1, inv_d, best_t
            )
            n_prims = bvh.n_prims[node]
            is_leaf = n_prims > 0

            # Leaf: test up to leaf_size triangles (masked).
            def leaf_scan(carry, k):
                bt, btri = carry
                valid = k < n_prims
                slot = bvh.start[node] + jnp.minimum(k, n_prims - 1)
                nt, ntri = tri_hit(slot, bt, btri)
                bt = jnp.where(valid & hit_box & is_leaf, nt, bt)
                btri = jnp.where(valid & hit_box & is_leaf, ntri, btri)
                return (bt, btri), None

            (best_t, best_tri), _ = jax.lax.scan(
                leaf_scan, (best_t, best_tri), jnp.arange(leaf_size)
            )

            # Inner: push children, near first popped last... reference
            # pushes the farther node first so the nearer pops first.
            left = node + 1
            right = node + bvh.right_offset[node]
            hit_l, tl = _slab_test(bvh.bbox_min[left], bvh.bbox_max[left], p1, inv_d, best_t)
            hit_r, tr = _slab_test(bvh.bbox_min[right], bvh.bbox_max[right], p1, inv_d, best_t)
            push = hit_box & (~is_leaf)
            near_is_left = tl <= tr
            first = jnp.where(near_is_left, right, left)  # pushed first (popped last)
            second = jnp.where(near_is_left, left, right)
            hit_first = jnp.where(near_is_left, hit_r, hit_l)
            hit_second = jnp.where(near_is_left, hit_l, hit_r)

            stack = jnp.where(push & hit_first, stack.at[sp].set(first), stack)
            sp1 = sp + jnp.where(push & hit_first, 1, 0)
            stack = jnp.where(push & hit_second, stack.at[sp1].set(second), stack)
            sp1 = sp1 + jnp.where(push & hit_second, 1, 0)
            return stack, sp1, best_t, best_tri

        stack0 = jnp.zeros((MAX_STACK,), dtype=jnp.int32)
        state = (stack0, jnp.int32(1), jnp.float32(jnp.inf), jnp.int32(2**30))
        state = jax.lax.while_loop(lambda s: s[1] > 0, body, state)
        _, _, best_t, best_tri = state
        return best_t, best_tri

    t_best, tri = jax.vmap(one_ray)(p, d)
    hit = jnp.isfinite(t_best)
    t_safe = jnp.where(hit, t_best, 0.0)
    point = p + d * t_safe[:, None]
    return Intersection(
        t=t_best, tri=jnp.where(hit, tri, 0).astype(jnp.int32), point=point, hit=hit
    )
