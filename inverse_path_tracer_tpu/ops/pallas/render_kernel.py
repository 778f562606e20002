"""Fused forward-render megakernel (Pallas/Mosaic).

The whole bounce loop — intersect, NEE (with its second intersect),
BSDF, RR, direction sampling, radiance accumulation — runs inside ONE
kernel per ray block, with every intermediate resident in VMEM.  This is
the TPU analogue of the reference's renderSample CUDA megakernel
(path_trace.cu:146-184), minus the divergence: lanes are masked, trips
are fixed.

Layout: rays live on the LANE axis.  Every per-ray quantity is
(k, BLOCK) with k on sublanes (vec3 -> 3 rows, per-triangle sweeps ->
(nT, BLOCK)), so nT=30 pads to 32 sublanes instead of the 30->128 lane
padding a (R, T) layout would pay.  Per-triangle plane tests are
(nT,4)x(4,BLOCK) MXU matmuls; hit-value lookup is one (13,nT)x(nT,BLOCK)
matmul against a one-hot selection built from argmin (ties resolve to
the lowest triangle index — the reference's scan order).

RNG: the kernel consumes the SAME threefry uniforms as the XLA path
(generated outside, passed in as a (bounces*6, tile) input), so the two
backends produce bit-comparable radiance — the XLA renderer is the
oracle in tests/test_pallas.py.

Gradients: the kernel is forward-only; render_samples wires it through
jax.custom_vjp with the XLA path as the backward (see render/forward.py)
so jax.grad keeps working when cfg.backend="pallas".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

PI = 3.141592653589793


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:
        return False


def _kernel(
    cfg_static,
    n_tri,
    n_emissive,
    # refs:
    p_ref,  # (3, BLOCK) ray origins
    d_ref,  # (3, BLOCK) ray dirs
    alive_ref,  # (1, BLOCK) f32 initial alive mask
    u_ref,  # (bounces*6, BLOCK) uniforms
    p0_ref,  # (nT, 4) plane eq (n, -c.n)
    e0_ref,  # (nT, 4) edge plane 0 (out, d)
    e1_ref,
    e2_ref,
    table_ref,  # (13, nT): emission/spec/shin/face_n/kd rows
    etab_ref,  # (17, nE): verts(9) emission(3) face_n(3) idx(1) p(1)
    cdf_ref,  # (nE, 1)
    rad_ref,  # out (3, BLOCK)
    stats_ref,  # out (2, BLOCK): per-lane segment/shadow counts
):
    (max_bounces, p_rr, min_dot, epsilon, quirks) = cfg_static
    block = p_ref.shape[1]

    ones_row = jnp.ones((1, block), dtype=jnp.float32)
    zeros_row = jnp.zeros((1, block), dtype=jnp.float32)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (n_tri, block), 0)
    iota_tf = iota_t.astype(jnp.float32)

    p0m = p0_ref[:]
    e0m = e0_ref[:]
    e1m = e1_ref[:]
    e2m = e2_ref[:]
    table = table_ref[:]
    etab = etab_ref[:]
    cdf = cdf_ref[:]  # (nE, 1)

    def intersect(p, d):
        """-> (t_best (1,B), hit (1,B) bool, sel (nT,B) f32, point (3,B))."""
        p4 = jnp.concatenate([p, ones_row], axis=0)  # (4, B)
        d4 = jnp.concatenate([d, zeros_row], axis=0)
        a0 = jnp.dot(p0m, p4, preferred_element_type=jnp.float32)  # (nT, B)
        b0 = jnp.dot(p0m, d4, preferred_element_type=jnp.float32)
        t = a0 / (-b0)
        inside = (jnp.abs(b0) >= min_dot) & (t >= epsilon)
        for em in (e0m, e1m, e2m):
            sd = jnp.dot(em, p4, preferred_element_type=jnp.float32) + t * jnp.dot(
                em, d4, preferred_element_type=jnp.float32
            )
            inside = inside & (sd <= 0.0)
        t_masked = jnp.where(inside, t, jnp.inf)
        t_best = jnp.min(t_masked, axis=0, keepdims=True)  # (1, B)
        hit = jnp.isfinite(t_best)
        idx = jnp.argmin(t_masked, axis=0).astype(jnp.int32)[None, :]  # (1, B)
        sel = ((iota_t == idx) & hit).astype(jnp.float32)  # (nT, B)
        t_safe = jnp.where(hit, t_best, 0.0)
        point = p + d * t_safe
        return t_best, hit, sel, point

    def normalize3(v):
        n = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
        return v / jnp.where(n > 0, n, 1.0)

    def dot3(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)  # (1, B)

    def spec_coeff(shin, normal, w, w_i):
        refl = -w_i + 2.0 * dot3(normal, w_i) * normal
        base = dot3(refl, w)
        powed = jnp.where(
            shin == 0.0,
            1.0,
            jnp.where(base > 0.0, jnp.power(jnp.maximum(base, 0.0), shin), 0.0),
        )
        return (shin + 2.0) / 2.0 / PI * powed

    def rotate_z_to(norm_dir, vec):
        nz = norm_dir[2:3]
        w = 1.0 + nz
        x = -norm_dir[1:2]
        y = norm_dir[0:1]
        qn2 = w * w + x * x + y * y
        degenerate = qn2 <= 1e-12
        qn = jnp.sqrt(jnp.where(degenerate, 1.0, qn2))
        w, x, y = w / qn, x / qn, y / qn
        vx, vy, vz = vec[0:1], vec[1:2], vec[2:3]
        rx = (1 - 2 * y * y) * vx + (2 * x * y) * vy + (2 * y * w) * vz
        ry = (2 * x * y) * vx + (1 - 2 * x * x) * vy + (-2 * x * w) * vz
        rz = (-2 * y * w) * vx + (2 * x * w) * vy + (1 - 2 * (x * x + y * y)) * vz
        rotated = jnp.concatenate([rx, ry, rz], axis=0)
        return jnp.where(degenerate, -vec, rotated)

    def body(b, carry):
        (p, d, radiance, l_e, l_d, prev_mult, alive, segs, shadows) = carry
        # 8 rows per bounce (6 used + 2 pad) keeps the dynamic
        # sublane slice 8-aligned for Mosaic.
        u = u_ref[pl.ds(b * 8, 8), :]  # (8, B)
        t_best, hit, sel, point = intersect(p, d)
        act = alive  # (1, B) f32 0/1
        hit_act = act * hit.astype(jnp.float32)

        hv = jnp.dot(table, sel, preferred_element_type=jnp.float32)  # (13, B)
        emission = hv[0:3]
        mat_spec = hv[3:6]
        mat_shin = hv[6:7]
        face_n = hv[7:10]
        kd = hv[10:13]
        shade_n = face_n  # flat-shaded scenes only (vn case uses XLA path)

        first = (b == 0).astype(jnp.float32)
        if quirks:
            l_e = jnp.where((hit_act * first) > 0, emission, l_e)
            l_e_contrib = l_e
        else:
            l_e = jnp.where((hit_act * first) > 0, emission, 0.0)
            l_e_contrib = l_e

        # --- NEE (path_trace.cu:30-89) ---
        if n_emissive > 0:
            u_pick = u[0:1]
            m = (cdf >= u_pick).astype(jnp.float32)  # (nE, B)
            eidx = jnp.argmax(m, axis=0).astype(jnp.int32)[None, :]
            iota_e = jax.lax.broadcasted_iota(jnp.int32, (n_emissive, block), 0)
            # rows where nothing matched (u > cdf max) clamp to last.
            any_m = jnp.max(m, axis=0, keepdims=True) > 0
            eidx = jnp.where(any_m, eidx, n_emissive - 1)
            e_onehot = (iota_e == eidx).astype(jnp.float32)
            row = jnp.dot(etab, e_onehot, preferred_element_type=jnp.float32)  # (17,B)
            sq = jnp.sqrt(u[1:2])
            r2c = u[2:3]
            emm_point = (
                (1.0 - sq) * row[0:3]
                + sq * (1.0 - r2c) * row[3:6]
                + r2c * sq * row[6:9]
            )
            to_light = normalize3(emm_point - point)
            cos_theta = dot3(shade_n, to_light)
            ok = hit_act * (cos_theta >= 0.0).astype(jnp.float32)
            st_best, s_hit, s_sel, _s_point = intersect(point, to_light)
            ok = ok * s_hit.astype(jnp.float32)
            light_n = row[12:15]
            cos_theta_p = -dot3(light_n, to_light)
            ok = ok * (cos_theta_p >= 0.0).astype(jnp.float32)
            shadow_idx_f = jnp.sum(s_sel * iota_tf, axis=0, keepdims=True)
            ok = ok * (shadow_idx_f == row[15:16]).astype(jnp.float32)
            geom = (
                cos_theta
                * cos_theta_p
                / jnp.where(ok > 0, st_best, 1.0) ** 2
                / row[16:17]
            )
            sc = spec_coeff(mat_shin, shade_n, d, to_light)
            bsdf_direct = kd + mat_spec * sc
            l_d_fresh = jnp.where(ok > 0, bsdf_direct * (row[9:12] * geom), 0.0)
            shadows = shadows + hit_act
        else:
            l_d_fresh = jnp.zeros_like(l_d)

        l_d = jnp.where(hit_act > 0, l_d_fresh, l_d)
        if quirks:
            contrib_mask = act
            l_d_contrib = l_d
        else:
            contrib_mask = hit_act
            l_d_contrib = jnp.where(hit_act > 0, l_d_fresh, 0.0)
        radiance = radiance + jnp.where(
            contrib_mask > 0, prev_mult * (l_e_contrib + l_d_contrib), 0.0
        )

        # --- RR + next direction (path_trace.cu:130-140) ---
        cont = hit_act * (u[3:4] < p_rr).astype(jnp.float32)
        is_spec = (
            jnp.max((mat_spec != 0.0).astype(jnp.float32), axis=0, keepdims=True)
            * (mat_shin != 0.0).astype(jnp.float32)
        )
        phi = 2.0 * PI * u[4:5]
        exponent = jnp.where(is_spec > 0, 1.0 / (mat_shin + 1.0), 0.5)
        cos_t = u[5:6] ** exponent
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        hemi = jnp.concatenate(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=0
        )
        next_dir = normalize3(rotate_z_to(face_n, hemi))
        pdf = jnp.where(
            is_spec > 0, ((mat_shin + 1.0) * cos_t) ** mat_shin, 1.0 / PI
        )
        sc2 = spec_coeff(mat_shin, shade_n, d, next_dir)
        bsdf = kd / PI + mat_spec * sc2
        cosine = dot3(next_dir, shade_n)
        coeff = jnp.where(pdf > 0, cosine / jnp.where(pdf > 0, pdf, 1.0) / p_rr, 0.0)
        coeff = jnp.where(cont > 0, coeff, 0.0)
        mult = prev_mult * bsdf * coeff

        p = jnp.where(cont > 0, point, p)
        d = jnp.where(cont > 0, next_dir, d)
        prev_mult = jnp.where(cont > 0, mult, prev_mult)
        segs = segs + act
        return (p, d, radiance, l_e, l_d, prev_mult, cont, segs, shadows)

    p = p_ref[:]
    d = d_ref[:]
    alive = alive_ref[:]
    zero3 = jnp.zeros((3, block), dtype=jnp.float32)
    carry = (
        p,
        d,
        zero3,
        zero3,
        zero3,
        zero3 + 1.0,
        alive,
        jnp.zeros((1, block), jnp.float32),
        jnp.zeros((1, block), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, max_bounces, body, carry)
    (_, _, radiance, _, _, _, _, segs, shadows) = carry
    rad_ref[:] = radiance
    stats_ref[:] = jnp.concatenate([segs, shadows], axis=0)


# pl is imported lazily so CPU-only environments without pallas work.
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def render_tile_pallas(
    materials: jnp.ndarray,
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    uniforms: jnp.ndarray,  # (bounces*8, tile): 6 used + 2 pad rows per bounce
    block: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one ray tile with the fused kernel.

    Returns (radiance (3, tile), stats (2, tile) per-lane seg/shadow
    counts).  Flat-shaded scenes only (scene.vertex_normals must be the
    empty static marker); the caller falls back to the XLA path
    otherwise."""
    n_tri = scene.vertices.shape[0]
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)

    # Packed tables (transposed layouts; see module docstring).
    pm = scene.plane_mat.reshape(4, n_tri, 4)  # (4, nT, 4)
    p0m = pm[:, :, 0].T  # (nT, 4)
    e0m = pm[:, :, 1].T
    e1m = pm[:, :, 2].T
    e2m = pm[:, :, 3].T
    table = jnp.concatenate(
        [
            scene.emission,
            scene.specular,
            scene.shininess[:, None],
            scene.face_normal,
            materials,
        ],
        axis=1,
    ).T  # (13, nT)
    ev = scene.vertices[scene.emissive_idx].reshape(-1, 9)
    etab = jnp.concatenate(
        [
            ev,
            scene.emission[scene.emissive_idx],
            scene.face_normal[scene.emissive_idx],
            scene.emissive_idx.astype(jnp.float32)[:, None],
            scene.emissive_p[:, None],
        ],
        axis=1,
    ).T  # (17, nE)
    cdf = scene.emissive_cdf[:, None]  # (nE, 1)

    cfg_static = (cfg.max_bounces, cfg.p_rr, cfg.min_dot, cfg.epsilon,
                  cfg.reference_quirks)
    kernel = functools.partial(_kernel, cfg_static, n_tri, n_e)

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    rad, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(cfg.max_bounces * 8),
            full(p0m),
            full(e0m),
            full(e1m),
            full(e2m),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=[ray_spec(3), ray_spec(2)],
        out_shape=[
            jax.ShapeDtypeStruct((3, tile), jnp.float32),
            jax.ShapeDtypeStruct((2, tile), jnp.float32),
        ],
        interpret=interpret,
    )(p, d, alive, uniforms, p0m, e0m, e1m, e2m, table, etab, cdf)
    return rad, stats
