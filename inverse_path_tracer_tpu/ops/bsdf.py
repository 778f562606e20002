"""BSDF evaluation.

The reference's BSDF is a diagonal 3x3 matrix (path_trace.cu:10-28); the
diagonal is carried here as a vec3, which keeps the whole throughput
"matrix" product (path_trace.cu:140) an elementwise vec3 product.

pi-convention (part of the behavioral contract, SURVEY.md §3.5(a)):
  * forward renderer: diffuse is divided by pi when *indirect*
    (path_trace.cu:15-17);
  * inverse extractor: the DIFFUSE factor is 1/pi when *direct*
    (inv_path_trace.cu:8) — the opposite.  Both are replicated in their
    respective modules; this function implements the forward convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from inverse_path_tracer_tpu.scene.build import SceneData

PI = 3.141592653589793


def specular_coeff(
    shininess: jnp.ndarray,  # (R,)
    shade_normal: jnp.ndarray,  # (R, 3)
    w: jnp.ndarray,  # (R, 3) outgoing query dir (the ray's d)
    w_i: jnp.ndarray,  # (R, 3) incoming light dir
) -> jnp.ndarray:
    """Phong lobe (n+2)/(2 pi) * max(refl.w, 0)^n  (path_trace.cu:19-23).

    CUDA's fmaxf(NaN, 0) returns 0, so pow(negative_base, float_n) -> NaN
    -> 0 in the reference; here the base is clamped before pow, with the
    n == 0 case yielding pow(x, 0) = 1 exactly as C pow does."""
    refl = -w_i + 2.0 * jnp.sum(shade_normal * w_i, axis=-1, keepdims=True) * shade_normal
    base = jnp.sum(refl * w, axis=-1)
    powed = jnp.where(
        shininess == 0.0,
        1.0,
        jnp.where(base > 0.0, jnp.power(jnp.maximum(base, 0.0), shininess), 0.0),
    )
    return (shininess + 2.0) / 2.0 / PI * powed


def bsdf_from_values(
    kd: jnp.ndarray,  # (R, 3)
    spec: jnp.ndarray,  # (R, 3)
    shininess: jnp.ndarray,  # (R,)
    shade_normal: jnp.ndarray,  # (R, 3)
    w: jnp.ndarray,
    w_i: jnp.ndarray,
    is_direct: bool,
) -> jnp.ndarray:
    """bsdf_diagonal with per-lane material values already resolved
    (the gather-free hot path: values come from sel @ table matmuls)."""
    diffuse = kd if is_direct else kd / PI
    coeff = specular_coeff(shininess, shade_normal, w, w_i)
    return diffuse + spec * coeff[:, None]


def bsdf_diagonal(
    materials: jnp.ndarray,  # (nT, 3) learnable Kd
    scene: SceneData,
    tri: jnp.ndarray,  # (R,) int32
    shade_normal: jnp.ndarray,  # (R, 3) smooth normal at hit
    w: jnp.ndarray,  # (R, 3)
    w_i: jnp.ndarray,  # (R, 3)
    is_direct: bool,
) -> jnp.ndarray:
    """Forward BSDF diagonal: diffuse (/pi iff indirect) + Phong specular
    (path_trace.cu:10-28).  Differentiable w.r.t. `materials` — this is
    where pixel cotangents enter per-triangle Kd."""
    kd = materials[tri]  # (R, 3)
    diffuse = kd if is_direct else kd / PI
    coeff = specular_coeff(scene.shininess[tri], shade_normal, w, w_i)
    return diffuse + scene.specular[tri] * coeff[:, None]
