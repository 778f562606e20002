"""Fused transport-graph extraction megakernel (Pallas/Mosaic).

The inverse bounce loop (reference inv_path_trace.cu renderSample
:152-182 / radiance :109-150 / directLighting :16-87) runs inside ONE
kernel per ray block; the dense (nT+1, nT) edge grids accumulate in a
VMEM carry (~40 KB for the 30-triangle Cornell scene) and are reduced
into the output across the sequential grid — the CUDA
`atomicAdd_system` edge writes (inv_scene.h:26-36) become two
lane-contraction matmuls per bounce:

    acc[d, k*Tp + s] += sum_lane dst_onehot[d, lane] *
                                 (src_onehot[s, lane] * v_k[lane])

with Q = 9 accumulated quantities (the reference's DIFFUSE channel set:
w, w*f0, w*f0*pixel(3), w*f0*light(3), visit count n).  The SPECULAR
channel is identically zero because the reference samples specular paths
with probability P_SPEC = 0 (inv_scene.h:5) and forces shininess to 0
(inv_path_trace.cu:118); this kernel therefore requires the static
cfg.p_spec == 0 — the XLA path (render/inverse.py) remains the general
(and oracle) implementation.

RNG follows the render kernels (render_kernel._make_uniform_stream):
external threefry uniforms reproduce the XLA inverse pass bit-for-bit
(tests/test_pallas_inverse.py); fused on-core PRNG removes the threefry
generation on real TPUs.  Row order per bounce matches render/inverse.py:
spec, nee_pick, nee_r1, nee_r2, rr, phi, theta (+1 pad row).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
    GEO,
    PI,
    _cfg_static,
    _make_geom,
    _make_uniform_stream,
    _pack_tables,
    _round_up,
    _u_spec_and_arg,
    pl,
    pltpu,
)

# Accumulated quantity count (columns k*Tp + s of the output grid):
# 0 w, 1 w*f0, 2-4 w*f0*pixel, 5-7 w*f0*light, 8 count.
N_QUANT = 9

# Rows per bounce in the records-mode output (8-aligned for dynamic
# sublane slices): dst, src, hit, w, nee_ok, nee_w, e_idx, pad.
REC_INV_ROWS = 8


def _kernel_inv(
    cfg_static,
    tp,  # padded triangle count (src axis)
    tpd,  # padded (nT+1) count (dst axis; eye row at index nT)
    n_tri,
    n_emissive,
    fused_rng,
    cluster_k,
    rec_mode,  # static: True -> stream per-bounce edge records instead
    # of carrying the dense VMEM accumulator (large scenes)
    # refs:
    p_ref,  # (3, BLOCK) ray origins
    d_ref,  # (3, BLOCK) ray dirs
    alive_ref,  # (1, BLOCK) f32 initial alive mask
    pix_ref,  # (3, BLOCK) observed pixel color per lane
    orig_ref,  # (1, BLOCK) i32 global sample indices (fused RNG)
    u_ref,  # (bounces*8, BLOCK) uniforms, or (2,) SMEM key words if fused
    pmat_ref,  # (4*Tp, 4) packed plane rows
    cab_ref,  # (8, C) cluster AABBs ((8, 1) dummy when cluster_k == 0)
    table_ref,  # (16|35, Tp) — face normals at rows 7:10 (+vn rows)
    etab_ref,  # (17|27, nE)
    cdf_ref,  # (nE, 1)
    acc_ref,  # out: (tpd, N_QUANT*Tp) accumulated across the grid, or
    # (bounces*REC_INV_ROWS, BLOCK) records when rec_mode
):
    (max_bounces, p_rr, min_dot, epsilon, _quirks, pair_split,
     fast_recip) = cfg_static
    block = p_ref.shape[1]
    geom = _make_geom(tp, pmat_ref[:], block, min_dot, epsilon,
                      cab=cab_ref[:], cluster_k=cluster_k,
                      pair_split=pair_split, fast_recip=fast_recip)
    table = table_ref[:]
    has_vn = table.shape[0] > 16  # static: 35 rows iff vertex normals
    etab = etab_ref[:]
    cdf = cdf_ref[:]
    pix = pix_ref[:]
    draw = _make_uniform_stream(fused_rng, u_ref, orig_ref, block)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (tpd, block), 0).astype(
        jnp.float32
    )

    def edge_grid(dst_f, mask, src_oh, w, f0, light):
        """One Edge::update batch -> (tpd, Q*Tp) grid increment.
        dst_f (1,B) f32 dst index, mask (1,B) 0/1, src_oh (Tp,B),
        w (1,B), f0 (1,B) DIFFUSE factor, light (3,B)."""
        dst_oh = ((iota_d == dst_f) & (mask > 0)).astype(jnp.float32)
        wm = w * mask
        wf = wm * f0
        payload = jnp.concatenate(
            [
                src_oh * wm,
                src_oh * wf,
                src_oh * (wf * pix[0:1]),
                src_oh * (wf * pix[1:2]),
                src_oh * (wf * pix[2:3]),
                src_oh * (wf * light[0:1]),
                src_oh * (wf * light[1:2]),
                src_oh * (wf * light[2:3]),
                src_oh * mask,
            ],
            axis=0,
        )  # (Q*Tp, B)
        # DEFAULT precision (explicit — None would inherit the global
        # 'highest'): the payload is material-independent
        # (weights/pixels/counts), one-hot factors are exact in bf16,
        # and the f32 operand-split of HIGHEST pushes this kernel's
        # scoped VMEM to 25.9M (> 16M limit) at the production block.
        return jax.lax.dot_general(
            dst_oh, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=GEO,
        )

    ones_row = geom.ones_row
    inv_pi_row = ones_row / PI
    zero3 = jnp.zeros((3, block), dtype=jnp.float32)

    def body(b, state):
        (isect, w, dst_f, alive, acc) = state
        u = draw(b, b)
        t_best, hit, idx_f, point = isect
        act = alive
        hit_act = act * hit  # hit is f32 0/1 (see render_kernel._finish)
        src_f = idx_f  # (1,B) argmin index, masked to 0 on miss
        # One-hot selection rebuilt from the carried hit index
        # (render_kernel._make_bounce does the same).
        sel = ((geom.iota_tf == idx_f) & (hit > 0)).astype(jnp.float32)
        # The inverse pass never reads Kd (factors are 1 and 1/pi) —
        # pure geometry lookup, GEO.
        hv = jnp.dot(table, sel, preferred_element_type=jnp.float32, precision=GEO)
        face_n = hv[7:10]
        if has_vn:
            # Smooth shading normal (inv_path_trace.cu:54,144 use
            # getNormal at the hit; sampling still rotates around the
            # face normal, :139).
            shade_n = geom.smooth_at(point, hv[13:22], hv[22:31], hv[31:32])
        else:
            shade_n = face_n

        # Indirect edge BEFORE the RR test (inv_path_trace.cu:128 vs
        # :135): factors[DIFFUSE] = 1 (:142), light = 0.
        w_edge = w
        if not rec_mode:
            acc = acc + edge_grid(dst_f, hit_act, sel, w, ones_row, zero3)

        # Diffuse next direction (:134-147; P_SPEC=0 so the path type is
        # always DIFFUSE, shininess 0, pdf = 1/pi — quirk Q3).  Sampled
        # before the NEE visibility test so the shadow ray and the next
        # primary ray share one intersect_pair matmul (render_kernel).
        cont = hit_act * (u[4:5] < p_rr).astype(jnp.float32)
        phi = 2.0 * PI * u[5:6]
        cos_t = jnp.sqrt(u[6:7])
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        hemi = jnp.concatenate(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=0
        )
        next_dir = geom.normalize3(geom.rotate_z_to(face_n, hemi))
        cosine = geom.dot3(next_dir, shade_n)  # :144 uses getNormal
        w_next = w * cosine * PI / p_rr  # / pdf(=1/pi) / (1 - P_SPEC(=0))

        # NEE edge (directLighting :16-87): dst = current triangle,
        # src = emissive; factors[DIFFUSE] = 1/pi (:8, :79).
        if n_emissive > 0:
            u_pick = u[1:2]
            m = (cdf >= u_pick).astype(jnp.float32)
            eidx = jnp.argmax(m, axis=0).astype(jnp.int32)[None, :]
            iota_e = jax.lax.broadcasted_iota(
                jnp.int32, (n_emissive, block), 0
            )
            any_m = jnp.max(m, axis=0, keepdims=True) > 0
            eidx = jnp.where(any_m, eidx, n_emissive - 1)
            e_onehot = (iota_e == eidx).astype(jnp.float32)
            row = jnp.dot(etab, e_onehot, preferred_element_type=jnp.float32, precision=GEO)
            sq = jnp.sqrt(u[2:3])
            r2c = u[3:4]
            emm_point = (
                (1.0 - sq) * row[0:3]
                + sq * (1.0 - r2c) * row[3:6]
                + r2c * sq * row[6:9]
            )
            to_light = geom.normalize3(emm_point - point)
            cos_theta = geom.dot3(shade_n, to_light)
            ok = hit_act * (cos_theta >= 0.0).astype(jnp.float32)
            (st_best, s_hit, s_idx_f), isect_next = geom.intersect_pair(
                point, to_light, next_dir
            )
            ok = ok * s_hit
            if has_vn:
                # t_emm->getNormal at the shadow hit (:61).
                s_point = point + to_light * jnp.where(s_hit > 0, st_best, 0.0)
                light_n = geom.smooth_at(
                    s_point, row[0:9], row[17:26], row[26:27]
                )
            else:
                light_n = row[12:15]
            cos_theta_p = -geom.dot3(light_n, to_light)
            ok = ok * (cos_theta_p >= 0.0).astype(jnp.float32)
            ok = ok * (s_idx_f == row[15:16]).astype(jnp.float32)
            nee_w = (
                w
                * cos_theta
                * cos_theta_p
                / jnp.where(ok > 0, st_best, 1.0) ** 2
                / row[16:17]
            )
            if not rec_mode:
                src_oh_e = (geom.iota_tf == row[15:16]).astype(jnp.float32)
                acc = acc + edge_grid(
                    src_f, ok, src_oh_e, nee_w, inv_pi_row, row[9:12]
                )
            e_idx_f = row[15:16]
        else:
            isect_next = geom.intersect(point, next_dir)
            ok = jnp.zeros_like(act)
            nee_w = jnp.zeros_like(w)
            e_idx_f = jnp.zeros_like(w)

        if rec_mode:
            # Stream this bounce's edge fields to HBM; the XLA
            # sort/segment reduction (render/inverse.py
            # _grids_from_edge_records) turns them into the dense grid
            # without any O(nT^2)-per-lane matmul.
            rec = jnp.concatenate(
                [dst_f, src_f, hit_act, w_edge, ok, nee_w, e_idx_f,
                 jnp.zeros_like(w_edge)],
                axis=0,
            )  # (REC_INV_ROWS, B)
            acc_ref[pl.ds(b * REC_INV_ROWS, REC_INV_ROWS), :] = rec

        w = jnp.where(cont > 0, w_next, w)
        dst_f = jnp.where(cont > 0, src_f, dst_f)
        return (isect_next, w, dst_f, cont, acc)

    state = (
        geom.intersect(p_ref[:], d_ref[:]),
        jnp.ones((1, block), jnp.float32),
        jnp.full((1, block), float(n_tri), jnp.float32),  # eye node = nT
        alive_ref[:],
        (jnp.zeros((1, 1), jnp.float32) if rec_mode
         else jnp.zeros((tpd, N_QUANT * tp), jnp.float32)),
    )
    state = jax.lax.fori_loop(0, max_bounces, body, state)
    if rec_mode:
        return
    acc = state[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += acc


def inverse_tile_pallas(
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    pix: jnp.ndarray,  # (3, tile) observed pixel colors
    uniforms: jnp.ndarray = None,  # (bounces*8, tile)
    block: int = 2048,
    interpret: bool = False,
    orig: jnp.ndarray = None,  # (1, tile) i32 global sample indices
    keys: jnp.ndarray = None,  # (2,) i32: fused hash-RNG mode
) -> jnp.ndarray:
    """Transport-grid accumulation for one ray tile.

    Returns the raw (Tpd, N_QUANT*Tp) accumulator; convert with
    grids_from_acc.  Requires cfg.p_spec == 0 (scenes with vertex
    normals are smooth-shaded in-kernel)."""
    assert cfg.p_spec == 0.0, "pallas inverse kernel requires p_spec == 0"
    n_tri = scene.vertices.shape[0]
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, scene.diffuse, cfg)
    tpd = _round_up(n_tri + 1, 8)
    if orig is None:
        orig = jnp.zeros((1, tile), jnp.int32)

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    u_spec, u_arg, fused_rng = _u_spec_and_arg(
        uniforms, keys, ray_spec, cfg.max_bounces * 8
    )

    kernel = functools.partial(
        _kernel_inv, _cfg_static(cfg), tp, tpd, n_tri, n_e, fused_rng, ck,
        False,
    )

    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(3),
            ray_spec(1),
            u_spec,
            full(pmat),
            full(cab),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=pl.BlockSpec(
            (tpd, N_QUANT * tp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tpd, N_QUANT * tp), jnp.float32),
        interpret=interpret,
    )(p, d, alive, pix, orig, u_arg, pmat, cab, table, etab, cdf)
    return acc


def inverse_tile_pallas_rec(
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    pix: jnp.ndarray,  # (3, tile) observed pixel colors
    uniforms: jnp.ndarray = None,  # (bounces*8, tile)
    block: int = 2048,
    interpret: bool = False,
    orig: jnp.ndarray = None,  # (1, tile) i32 global sample indices
    keys: jnp.ndarray = None,  # (2,) i32: fused hash-RNG mode
) -> jnp.ndarray:
    """Records-mode inverse trace for LARGE scenes: the same fused
    bounce loop (cluster-chunked intersects, in-kernel smooth shading),
    but per-bounce edge fields stream to HBM instead of accumulating a
    dense (Tpd, 9*Tp) grid in VMEM — the grid would need O(nT^2) VMEM
    (~66 MB at 1298 triangles vs the 16 MB budget; see
    render/inverse.py's fits gate).  Returns (bounces*REC_INV_ROWS,
    tile) records; reduce with render/inverse.py
    _grids_from_edge_records.  Indices in the records are
    kernel-INTERNAL (Morton) — the reducer maps them back via
    kernel_perm.  Requires cfg.p_spec == 0, like the dense kernel."""
    assert cfg.p_spec == 0.0, "pallas inverse kernel requires p_spec == 0"
    n_tri = scene.vertices.shape[0]
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, scene.diffuse, cfg)
    tpd = _round_up(n_tri + 1, 8)
    if orig is None:
        orig = jnp.zeros((1, tile), jnp.int32)

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    u_spec, u_arg, fused_rng = _u_spec_and_arg(
        uniforms, keys, ray_spec, cfg.max_bounces * 8
    )
    kernel = functools.partial(
        _kernel_inv, _cfg_static(cfg), tp, tpd, n_tri, n_e, fused_rng, ck,
        True,
    )
    rec_rows = cfg.max_bounces * REC_INV_ROWS
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
        _compiler_params,
    )

    rec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(3),
            ray_spec(1),
            u_spec,
            full(pmat),
            full(cab),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=ray_spec(rec_rows),
        out_shape=jax.ShapeDtypeStruct((rec_rows, tile), jnp.float32),
        compiler_params=_compiler_params(interpret, True),
        interpret=interpret,
    )(p, d, alive, pix, orig, u_arg, pmat, cab, table, etab, cdf)
    return rec


def grids_from_acc(acc: jnp.ndarray, n_tri: int, perm=None):
    """Raw kernel accumulator -> TransportGrids (render/inverse.py).

    SPECULAR channels are exactly zero.  Note one benign difference from
    the XLA path: the reference seeds the path factors as {1., 1.}
    (both channels), so XLA eye-row indirect edges carry a nonzero
    SPECULAR factors/pixel sum; with P_SPEC = 0 that channel is never
    read by compress (inv_scene.h:87-115 exports DIFFUSE only), so this
    kernel drops it entirely.

    perm (kernel_perm(scene, cfg)) maps the clustered kernels' internal
    Morton triangle order back to global indices on BOTH grid axes (the
    eye row, dst == n_tri, is position-invariant)."""
    from inverse_path_tracer_tpu.render.inverse import TransportGrids

    tpd, qtp = acc.shape
    tp = qtp // N_QUANT
    a = acc.reshape(tpd, N_QUANT, tp)[: n_tri + 1, :, :n_tri]  # (D, Q, S)
    if perm is not None:
        tri = jnp.zeros_like(a[:n_tri]).at[perm].set(a[:n_tri])
        a = jnp.concatenate([tri, a[n_tri : n_tri + 1]], axis=0)
        a = jnp.zeros_like(a).at[:, :, perm].set(a)
    flat = lambda x: x.reshape((n_tri + 1) * n_tri)
    w_sum = flat(a[:, 0])
    f0 = flat(a[:, 1])
    pix = a[:, 2:5].transpose(0, 2, 1).reshape(-1, 3)
    light = a[:, 5:8].transpose(0, 2, 1).reshape(-1, 3)
    count = flat(a[:, 8])
    z1 = jnp.zeros_like(f0)
    z3 = jnp.zeros_like(pix)
    return TransportGrids(
        w_sum=w_sum,
        pixel_sum=jnp.stack([pix, z3], axis=1),
        light_sum=jnp.stack([light, z3], axis=1),
        factors_sum=jnp.stack([f0, z1], axis=1),
        count=count,
    )
