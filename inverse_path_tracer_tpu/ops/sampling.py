"""Direction / light sampling (counter-based threefry RNG).

Replaces the reference's cuRAND per-thread sequences
(path_trace.cu:91-109 sampleNextDir, :30-62 emissive CDF pick +
sqrt-barycentric point sample).  Parity with cuRAND is distributional,
never bitwise: identical pdfs and identical *returned pdf values*
(including the reference's nonstandard diffuse pdf of 1/pi for a
cosine-sampled direction — that constant is part of the estimator's
behavioral contract, see SURVEY.md §3.5(b)).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from inverse_path_tracer_tpu.scene.build import SceneData

PI = 3.141592653589793


def rotate_z_to(norm_dir: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Rotate `vec` by the minimal rotation taking +z to `norm_dir`.

    Matches Eigen Quaternionf::FromTwoVectors((0,0,1), n) with the
    reference's special case R = -I when n.z == -1
    (path_trace.cu:97-103).  Quaternion q = normalize(1 + n.z, cross(z, n))
    = normalize((w, x, y, 0)) with w = 1+nz, x = -ny, y = nx."""
    nz = norm_dir[..., 2]
    w = 1.0 + nz
    x = -norm_dir[..., 1]
    y = norm_dir[..., 0]
    qn2 = w * w + x * x + y * y
    degenerate = qn2 <= 1e-12
    qn = jnp.sqrt(jnp.where(degenerate, 1.0, qn2))
    w, x, y = w / qn, x / qn, y / qn

    # Rotation matrix rows for unit quaternion (w, x, y, 0).
    vx, vy, vz = vec[..., 0], vec[..., 1], vec[..., 2]
    rx = (1 - 2 * y * y) * vx + (2 * x * y) * vy + (2 * y * w) * vz
    ry = (2 * x * y) * vx + (1 - 2 * x * x) * vy + (-2 * x * w) * vz
    rz = (-2 * y * w) * vx + (2 * x * w) * vy + (1 - 2 * (x * x + y * y)) * vz
    rotated = jnp.stack([rx, ry, rz], axis=-1)
    # n.z == -1 special case: R = -I (a reflection; distributionally a
    # valid hemisphere frame, kept for parity).
    return jnp.where(degenerate[..., None], -vec, rotated)


def sample_next_dir(
    norm_dir: jnp.ndarray,  # (R, 3) FACE normal (reference uses tri->normal)
    is_specular: jnp.ndarray,  # (R,) bool
    shininess: jnp.ndarray,  # (R,)
    u_phi: jnp.ndarray,  # (R,) uniforms
    u_theta: jnp.ndarray,  # (R,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample the next bounce direction.

    phi = 2*pi*u1; theta = acos(u2^(1/2)) diffuse or acos(u2^(1/(n+1)))
    specular; hemisphere dir rotated to the normal frame.  Returns
    (next_dir (R,3), pdf (R,)) with the reference's pdf values: 1/pi for
    diffuse, ((n+1)*cos(theta))^n for specular (path_trace.cu:91-109)."""
    phi = 2.0 * PI * u_phi
    exponent = jnp.where(is_specular, 1.0 / (shininess + 1.0), 0.5)
    cos_theta = u_theta**exponent
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    hemi = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    next_dir = rotate_z_to(norm_dir, hemi)
    n = jnp.linalg.norm(next_dir, axis=-1, keepdims=True)
    next_dir = jnp.where(n > 0, next_dir / jnp.where(n > 0, n, 1.0), next_dir)
    pdf = jnp.where(
        is_specular,
        ((shininess + 1.0) * cos_theta) ** shininess,
        1.0 / PI,
    )
    return next_dir, pdf


def pick_emissive(scene: SceneData, u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Area-weighted CDF pick of an emissive triangle
    (reference path_trace.cu:40-51): first index whose inclusive CDF
    >= u; returns (global tri index (R,), selection prob p_t (R,)).

    The reference's p_t is the *selection probability only* — there is
    no 1/area density term for the point inside the triangle
    (SURVEY.md §3.5(c)); replicated."""
    e = jnp.searchsorted(scene.emissive_cdf, u, side="left")
    e = jnp.clip(e, 0, scene.emissive_idx.shape[0] - 1).astype(jnp.int32)
    return scene.emissive_idx[e], scene.emissive_p[e]


def sample_emissive_point(
    scene: SceneData, tri: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray
) -> jnp.ndarray:
    """sqrt-barycentric uniform point on a triangle
    (reference path_trace.cu:55-62):
    (1 - sqrt(r1)) v1 + sqrt(r1)(1 - r2) v2 + r2 sqrt(r1) v3."""
    v = scene.vertices[tri]  # (R, 3, 3)
    sq = jnp.sqrt(r1)[..., None]
    r2 = r2[..., None]
    return (1.0 - sq) * v[:, 0] + sq * (1.0 - r2) * v[:, 1] + r2 * sq * v[:, 2]
