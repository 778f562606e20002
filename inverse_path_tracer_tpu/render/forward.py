"""Forward Monte-Carlo path tracer with next-event estimation.

TPU-native wavefront re-design of the reference's CUDA megakernel
(path_trace.cu:146-198): one CUDA thread per (pixel, sample) becomes a
jitted bounce *scan* over tiled ray batches; Russian-roulette termination
and hit/miss divergence become lane masks; the unbounded `while (recur)`
(path_trace.cu:175) becomes a fixed-trip masked loop of cfg.max_bounces.

The per-bounce math is replicated as the behavioral contract
(SURVEY.md §3.5), including these reference quirks (active when
cfg.reference_quirks, the default):

  (Q1) L_e is set only at bounce 0 but never cleared, and
       `L += prevMultiplier * (L_e + L_d)` runs every iteration
       (path_trace.cu:122-124, 175-181) — first-hit emission is re-added
       at every bounce scaled by the running throughput.
  (Q2) when a ray escapes, `radiance` returns without touching L_d, yet
       the loop body still adds prevMultiplier*(L_e + L_d) once more with
       the *stale* L_d of the previous bounce (path_trace.cu:117,175-181).
  (Q3) diffuse sampling returns pdf = 1/pi for a cosine-sampled direction
       (true pdf cos(theta)/pi; path_trace.cu:94,108).
  (Q4) NEE weight cos*cos'/t^2/p_t with p_t the CDF selection probability
       only — no 1/area density inside the chosen triangle
       (path_trace.cu:51,86).

With reference_quirks=False, (Q1) adds emission exactly once and (Q2)
adds nothing on escape ((Q3)/(Q4) are estimator conventions that cancel
in expectation against the corresponding weights; they are kept).

Differentiability: path geometry (directions, RR, hit points) is
independent of the (nT,3) material array — gradients flow only through
the BSDF products and NEE emission terms, so plain `jax.grad` of any
image loss w.r.t. `materials` is exact pathwise differentiation.  The
bounce scan is rematerialized (jax.checkpoint) to keep backward memory at
O(tile) instead of O(tile * bounces * nT).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.ops.bsdf import bsdf_from_values
from inverse_path_tracer_tpu.ops.intersect import (
    Intersection,
    intersect_onehot,
    smooth_normal,
)
from inverse_path_tracer_tpu.ops.sampling import sample_next_dir
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean, tonemap_to_uint8
from inverse_path_tracer_tpu.scene.build import SceneData

# RNG slot ids within one bounce (any distinct constants work — the
# threefry counter construction makes streams independent).
_SLOT_NEE_PICK, _SLOT_NEE_R1, _SLOT_NEE_R2, _SLOT_RR, _SLOT_PHI, _SLOT_THETA = range(6)
# Camera jitter slots (bounce index 0; slots 0-5 are the bounce slots so
# 6/7 never collide — fold_in data must be non-negative).
_SLOT_JITTER_X, _SLOT_JITTER_Y = 6, 7


def _u(key: jax.Array, bounce, slot: int, n: int) -> jnp.ndarray:
    """Counter-based uniform stream: independent per (key, bounce, slot, lane)."""
    return jax.random.uniform(jax.random.fold_in(jax.random.fold_in(key, bounce), slot), (n,))


class RenderStats(NamedTuple):
    """Ray accounting for rays/sec metrics (all f32 scalars)."""

    segments: jnp.ndarray  # path segments actually traced (alive lanes per bounce)
    shadow_rays: jnp.ndarray  # NEE shadow rays actually traced (hit lanes per bounce)


def camera_rays(
    scene: SceneData, cfg: RenderConfig, key: jax.Array, sample_idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Primary rays for global sample indices curr = (r*W + c)*spp + s
    (reference path_trace.cu:155-165):
    x = 2(c+u)/W - 1, y = 1 - 2(r+u)/H, d = normalize(x, y, 1), then the
    S @ V^T camera transform (p' = M33 @ p, translation dropped — see
    scene/build.py docstring)."""
    n = sample_idx.shape[0]
    r = (sample_idx // (cfg.spp * cfg.width)).astype(jnp.float32)
    c = ((sample_idx // cfg.spp) % cfg.width).astype(jnp.float32)
    u1 = _u(key, 0, _SLOT_JITTER_X, n)
    u2 = _u(key, 0, _SLOT_JITTER_Y, n)
    x = 2.0 * (c + u1) / cfg.width - 1.0
    y = 1.0 - 2.0 * (r + u2) / cfg.height
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d @ scene.cam_m33.T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    p = jnp.zeros_like(d)
    return p, d


def _intersect(
    scene: SceneData, cfg: RenderConfig, p: jnp.ndarray, d: jnp.ndarray
) -> Tuple[Intersection, jnp.ndarray]:
    """Intersection + one-hot selection, per cfg.intersect: the dense
    plane-matmul sweep (default; MXU-optimal at these scene sizes) or
    stack-based BVH traversal (cfg.intersect="bvh" on a scene with an
    attached BVH — ops/bvh.py attach_bvh / load_scene(with_bvh=True))."""
    if cfg.intersect == "bvh" and len(scene.bvh):
        from inverse_path_tracer_tpu.ops.bvh import BVHData, intersect_bvh

        isect = intersect_bvh(
            scene, BVHData(*scene.bvh), p, d, cfg.min_dot, cfg.epsilon
        )
        sel = (
            (isect.tri[:, None] == jnp.arange(scene.n_tri)[None, :])
            & isect.hit[:, None]
        ).astype(p.dtype)
        return isect, sel
    return intersect_onehot(scene, p, d, cfg.min_dot, cfg.epsilon)


def _emissive_table(scene: SceneData) -> jnp.ndarray:
    """(E, 17) packed per-emissive table: verts 0:9, emission 9:12,
    face_normal 12:15, global tri index 15, selection prob 16.  Rows are
    fetched with a one-hot matmul — no R-sized gathers in the hot loop."""
    ev = scene.vertices[scene.emissive_idx].reshape(-1, 9)
    ee = scene.emission[scene.emissive_idx]
    en = scene.face_normal[scene.emissive_idx]
    ei = scene.emissive_idx.astype(jnp.float32)[:, None]
    ep = scene.emissive_p[:, None]
    return jnp.concatenate([ev, ee, en, ei, ep], axis=1)


def direct_lighting(
    scene: SceneData,
    cfg: RenderConfig,
    u_nee: jnp.ndarray,  # (3, R) uniforms: pick, r1, r2
    ray_d: jnp.ndarray,
    isect: Intersection,
    shade_n: jnp.ndarray,  # (R, 3) smooth normal at the hit
    kd: jnp.ndarray,  # (R, 3) per-lane material values (sel @ table)
    spec: jnp.ndarray,  # (R, 3)
    shin: jnp.ndarray,  # (R,)
) -> jnp.ndarray:
    """Next-event estimation (reference directLighting path_trace.cu:30-89),
    gather-free.  Returns the (R,3) direct radiance (zero where any
    visibility / orientation check fails).  Scenes with no emissives
    return zero (static shape check, path_trace.cu:34)."""
    n = ray_d.shape[0]
    if scene.n_emissive == 0:
        z = jnp.zeros((n, 3), dtype=ray_d.dtype)
        return z, z

    u_pick, r1, r2 = u_nee[0], u_nee[1], u_nee[2]
    n_e = scene.n_emissive

    # CDF pick (path_trace.cu:40-51): first index with cdf >= u.
    e_idx = jnp.clip(
        jnp.searchsorted(scene.emissive_cdf, u_pick, side="left"), 0, n_e - 1
    )
    onehot_e = (e_idx[:, None] == jnp.arange(n_e)[None, :]).astype(ray_d.dtype)
    row = onehot_e @ _emissive_table(scene)  # (R, 17)

    # sqrt-barycentric point sample (:55-62).
    sq = jnp.sqrt(r1)[:, None]
    r2c = r2[:, None]
    emm_point = (
        (1.0 - sq) * row[:, 0:3]
        + sq * (1.0 - r2c) * row[:, 3:6]
        + r2c * sq * row[:, 6:9]
    )

    to_light = emm_point - isect.point
    to_light = to_light / jnp.linalg.norm(to_light, axis=-1, keepdims=True)

    cos_theta = jnp.sum(shade_n * to_light, axis=-1)
    ok = cos_theta >= 0.0  # reference rejects cos < 0 strictly (:71)

    shadow, sel_sh = _intersect(scene, cfg, isect.point, to_light)
    ok = ok & shadow.hit

    # Normal of the light at the shadow hit: face normal for flat meshes
    # (the static fast path); barycentric interpolation otherwise.
    if scene.vertex_normals.shape[1] == 0:
        light_n = row[:, 12:15]
    else:
        t_emm_i = scene.emissive_idx[e_idx]
        light_n = smooth_normal(scene, t_emm_i, shadow.point)
    cos_theta_p = -jnp.sum(light_n * to_light, axis=-1)
    ok = ok & (cos_theta_p >= 0.0)

    # shadow.tri == t_emm (:81): compare indices in f32 (exact for
    # indices < 2^24) via the one-hot rows — no gathers.
    iota_t = jnp.arange(scene.n_tri, dtype=ray_d.dtype)
    shadow_idx_f = sel_sh @ iota_t
    ok = ok & (shadow_idx_f == row[:, 15])

    l_o = row[:, 9:12]
    geom = cos_theta * cos_theta_p / jnp.where(ok, shadow.t, 1.0) ** 2 / row[:, 16]
    bsdf = bsdf_from_values(kd, spec, shin, shade_n, ray_d, to_light, True)
    # nee_term is the material-independent factor: l_d = bsdf_direct *
    # nee_term.  Exposed for the analytic VJP (render/diff.py).
    nee_term = jnp.where(ok[:, None], l_o * geom[:, None], 0.0)
    return jnp.where(ok[:, None], bsdf * (l_o * geom[:, None]), 0.0), nee_term


class BounceRecords(NamedTuple):
    """Per-bounce residuals for the analytic material VJP
    (render/diff.py).  The estimator is multilinear in per-bounce Kd, so
    these are everything the backward sweep needs — no AD through the
    scan, no gathers."""

    f: jnp.ndarray  # (R, 3) throughput factor bsdf*coeff (0 when dead)
    c: jnp.ndarray  # (R, 3) masked per-bounce contribution l_e + l_d
    nee: jnp.ndarray  # (R, 3) material-independent NEE factor l_o*geom*ok
    coeff: jnp.ndarray  # (R,) cosine/pdf/p_RR (0 when dead)
    tri: jnp.ndarray  # (R,) int32 hit triangle (0 on miss)
    hit_act: jnp.ndarray  # (R,) bool
    escape: jnp.ndarray  # (R,) bool: alive-in but missed (quirk Q2 lanes)


class _BounceState(NamedTuple):
    ray_p: jnp.ndarray  # (R, 3)
    ray_d: jnp.ndarray  # (R, 3)
    radiance: jnp.ndarray  # (R, 3) accumulated L
    l_e: jnp.ndarray  # (R, 3) first-hit emission (quirk Q1)
    l_d: jnp.ndarray  # (R, 3) last direct lighting (stale on escape, Q2)
    prev_mult: jnp.ndarray  # (R, 3) diagonal throughput entering this bounce
    alive: jnp.ndarray  # (R,) bool


def _bounce_step(
    materials: jnp.ndarray,
    scene: SceneData,
    cfg: RenderConfig,
    key: jax.Array,
    state: _BounceState,
    bounce,
    with_records: bool = False,
):
    """One wavefront bounce over all lanes (reference radiance
    path_trace.cu:111-144 + the loop body :175-181)."""
    n = state.ray_p.shape[0]
    # One threefry dispatch per bounce for all six uniform streams.
    u = jax.random.uniform(jax.random.fold_in(key, bounce), (6, n))
    isect, sel = _intersect(scene, cfg, state.ray_p, state.ray_d)
    act = state.alive
    hit_act = act & isect.hit

    # All per-hit lookups in one (R,T)@(T,13) matmul: emission 0:3,
    # specular 3:6, shininess 6, face_normal 7:10, Kd 10:13.  Miss lanes
    # have a zero sel row -> zero values, which every consumer masks.
    table = jnp.concatenate(
        [
            scene.emission,
            scene.specular,
            scene.shininess[:, None],
            scene.face_normal,
            materials,
        ],
        axis=1,
    )
    hv = sel @ table
    emission = hv[:, 0:3]
    mat_spec = hv[:, 3:6]
    mat_shin = hv[:, 6]
    face_n = hv[:, 7:10]
    kd = hv[:, 10:13]
    if scene.vertex_normals.shape[1] == 0:
        shade_n = face_n
    else:
        shade_n = smooth_normal(scene, isect.tri, isect.point)
    if cfg.reference_quirks:
        l_e = jnp.where((hit_act & (bounce == 0))[:, None], emission, state.l_e)
        l_e_contrib = l_e
    else:
        # Corrected: emission of the first hit contributes exactly once.
        l_e = jnp.where((hit_act & (bounce == 0))[:, None], emission, 0.0)
        l_e_contrib = l_e

    # Direct lighting at the current hit (fresh for hits; stale kept for
    # escaping lanes — Q2).
    l_d_fresh, nee_term = direct_lighting(
        scene,
        cfg,
        u[_SLOT_NEE_PICK : _SLOT_NEE_R2 + 1],
        state.ray_d,
        isect,
        shade_n,
        kd,
        mat_spec,
        mat_shin,
    )
    l_d = jnp.where(hit_act[:, None], l_d_fresh, state.l_d)
    if cfg.reference_quirks:
        contrib_mask = act  # escaped lanes still add prev*(L_e + stale L_d)
        l_d_contrib = l_d
    else:
        contrib_mask = hit_act
        l_d_contrib = jnp.where(hit_act[:, None], l_d_fresh, 0.0)

    radiance = state.radiance + jnp.where(
        contrib_mask[:, None], state.prev_mult * (l_e_contrib + l_d_contrib), 0.0
    )

    # Russian roulette (:130-131): continue iff u < p_RR.
    cont = hit_act & (u[_SLOT_RR] < cfg.p_rr)

    # Next direction: sampled around the FACE normal (:134 uses
    # tri->normal), while the throughput cosine uses the smooth normal
    # (:137 uses getNormal).
    is_specular = (mat_spec != 0.0).any(axis=-1) & (mat_shin != 0.0)
    next_dir, pdf = sample_next_dir(
        face_n, is_specular, mat_shin, u[_SLOT_PHI], u[_SLOT_THETA]
    )
    bsdf = bsdf_from_values(
        kd, mat_spec, mat_shin, shade_n, state.ray_d, next_dir, False
    )
    # pdf can be exactly 0 on measure-zero specular draws (cos(theta)=0);
    # the reference would produce inf throughput there.  Zero the lane
    # instead, and zero dead lanes too so no NaN/inf can leak into
    # d(materials) through the 0*grad(where) trap.
    cosine = jnp.sum(next_dir * shade_n, axis=-1)
    coeff = jnp.where(pdf > 0, cosine / jnp.where(pdf > 0, pdf, 1.0) / cfg.p_rr, 0.0)
    coeff = jnp.where(cont, coeff, 0.0)
    mult = state.prev_mult * bsdf * coeff[:, None]

    new_state = _BounceState(
        ray_p=jnp.where(cont[:, None], isect.point, state.ray_p),
        ray_d=jnp.where(cont[:, None], next_dir, state.ray_d),
        radiance=radiance,
        l_e=l_e,
        l_d=l_d,
        prev_mult=jnp.where(cont[:, None], mult, state.prev_mult),
        alive=cont,
    )
    seg = jnp.sum(act.astype(jnp.float32))
    shadow = jnp.sum(hit_act.astype(jnp.float32))
    if with_records:
        records = BounceRecords(
            f=bsdf * coeff[:, None],
            c=jnp.where(contrib_mask[:, None], l_e_contrib + l_d_contrib, 0.0),
            nee=nee_term,
            coeff=coeff,
            tri=isect.tri,
            hit_act=hit_act,
            escape=act & ~isect.hit,
        )
        return new_state, (seg, shadow, records)
    return new_state, (seg, shadow)


def _render_tile(
    materials: jnp.ndarray,
    scene: SceneData,
    cfg: RenderConfig,
    key: jax.Array,
    start_idx: jnp.ndarray,
    tile: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render `tile` consecutive samples starting at start_idx."""
    idx = start_idx + jnp.arange(tile, dtype=jnp.int32)
    in_range = idx < cfg.n_samples
    tkey = jax.random.fold_in(key, start_idx // tile)

    p, d = camera_rays(scene, cfg, tkey, idx)
    # Derive the zero/one inits from p so they carry the same
    # varying-axis type as the ray state under shard_map (a plain
    # jnp.zeros would be "replicated" and trip the scan carry check).
    zero3 = p * 0.0
    state = _BounceState(
        ray_p=p,
        ray_d=d,
        radiance=zero3,
        l_e=zero3,
        l_d=zero3,
        prev_mult=zero3 + 1.0,
        alive=in_range,
    )

    step = lambda s, b: _bounce_step(materials, scene, cfg, tkey, s, b)
    if cfg.remat == "both":
        step = jax.checkpoint(step)
    state, (segs, shadows) = jax.lax.scan(
        step, state, jnp.arange(cfg.max_bounces, dtype=jnp.int32)
    )
    return state.radiance, jnp.sum(segs), jnp.sum(shadows)


def _render_range_xla(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> Tuple[jnp.ndarray, RenderStats]:
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)

    if cfg.grad_mode == "custom":
        # Analytic per-tile VJP (render/diff.py): backward replays the
        # tile once and runs the multilinear suffix recursion.
        from inverse_path_tracer_tpu.render.diff import render_tile_custom_vjp

        def tile_fn(tile_start):
            return render_tile_custom_vjp(
                materials, scene, cfg, key, tile_start, tile
            )

    else:
        # Rematerialize whole tiles: without this, AD through the tile
        # map stores every bounce carry for every tile at once
        # (n_tiles x bounces x tile x 3 floats x ~6 arrays — tens of GB
        # at 512x512x64spp).  With it, the backward pass replays one
        # tile's bounce scan at a time, bounding residuals to
        # O(tile x bounces).
        @jax.checkpoint
        def tile_fn(tile_start):
            return _render_tile(materials, scene, cfg, key, tile_start, tile)

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    vals, segs, shadows = jax.lax.map(tile_fn, starts)
    stats = RenderStats(segments=jnp.sum(segs), shadow_rays=jnp.sum(shadows))
    return vals.reshape(-1, 3)[: count], stats


def _pallas_uniforms(tkey: jax.Array, cfg: RenderConfig, n: int) -> jnp.ndarray:
    """The XLA bounce loop's per-bounce uniforms, stacked for the fused
    kernel: 8 rows per bounce (6 used + 2 zero pad for sublane-aligned
    dynamic slices).  Same keys => the two backends see identical
    randomness."""
    rows = []
    for b in range(cfg.max_bounces):
        u = jax.random.uniform(jax.random.fold_in(tkey, b), (6, n))
        rows.append(jnp.concatenate([u, jnp.zeros((2, n), u.dtype)], axis=0))
    return jnp.concatenate(rows, axis=0)


def _pallas_fused_rng(cfg: RenderConfig, interpret: bool) -> bool:
    """Whether the render kernels should draw uniforms from the in-kernel
    counter-hash RNG (ops/pallas/render_kernel.py _make_uniform_stream).
    Requires the fused backward (grad_mode="custom"): the XLA records
    replay of grad_mode="records" can only reproduce external threefry
    streams.  cfg.rng="auto" enables it on a real TPU only (so the CPU
    test suite keeps exercising the external bit-parity mode by
    default); "fused" forces it anywhere, including the interpreter —
    the hash RNG, unlike the stateful pltpu PRNG it replaced, lowers
    under interpret, so fused-mode gradients are FD-checked on CPU in
    tests/test_pallas.py, not just on hardware."""
    if cfg.rng not in ("auto", "external", "fused"):
        raise ValueError(f"unknown cfg.rng {cfg.rng!r}")
    if cfg.grad_mode != "custom":
        if cfg.rng == "fused":
            raise ValueError(
                "rng='fused' requires grad_mode='custom': the XLA records "
                "replay (grad_mode='records') can only reproduce external "
                "threefry uniform streams."
            )
        return False
    if cfg.rng == "fused":
        return True
    return cfg.rng == "auto" and not interpret


def _pallas_keys(key: jax.Array) -> jnp.ndarray:
    """(2,) int32 render-key words for the fused counter-hash RNG: the
    per-(sample, bounce, slot) streams they seed are pure functions of
    the GLOBAL sample index, so renders are bit-identical under any
    tiling, sharding, or lane compaction."""
    kd = jax.random.key_data(key).reshape(-1)[:2]
    return jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)


def _pallas_block(
    scene: SceneData, tile: int, records: bool = False, u_rows: int = 0
) -> int:
    """Ray-block width for the fused kernels.  The dominant VMEM
    temporaries scale with Tp*block (the packed intersect planes are
    (4*Tp, 2*block)), so larger scenes shrink the block to hold the
    working set near the measured sweet spot: Tp*block = 2^18 for the
    forward/inverse kernels (block 8192 at the reference Tp=32 — 25.3
    vs 27.9 ms/tile at 4096 on v5e), and 2^17 for the backward kernel,
    whose (bounces*REC_ROWS, block) records scratch exceeds VMEM at
    8192.

    u_rows: extra per-lane VMEM rows the kernel streams alongside the
    carry — the external-RNG uniforms block (bounces*8 rows; zero in
    fused mode).  At 16 bounces the (128, 8192) uniforms slice alone is
    4.2 MB and tips the forward kernel over scoped VMEM (found by
    scripts/smoke_tpu.py on hardware — the fused-RNG default had always
    masked it), so the block budget caps u_rows*block at 2^19 lanes."""
    tp = max(8, -(-scene.vertices.shape[0] // 8) * 8)
    # Hardware-tuning overrides (scripts/bench_scene.py sweeps): scoped
    # per kernel family — the backward/records kernels have HALF the
    # forward VMEM budget, so a forward-tuned IPT_BLOCK left in the
    # environment must not leak into them (it would VMEM-OOM only on
    # hardware).  IPT_BLOCK applies to forward-budget kernels only;
    # IPT_BLOCK_BWD to the records/backward family.
    ov = int(os.environ.get("IPT_BLOCK_BWD" if records else "IPT_BLOCK", "0"))
    if ov:
        # Must be a multiple of 128 dividing the tile; VMEM fit is the
        # caller's responsibility (smoke_tpu.py catches overshoots).
        if ov % 128 != 0 or tile % ov != 0:
            raise ValueError(
                f"IPT_BLOCK{'_BWD' if records else ''}={ov} must be a "
                f"multiple of 128 dividing tile {tile}"
            )
        return ov
    cap = 1 << (17 if records else 18)
    budget = max(128, cap // tp)
    if u_rows:
        budget = min(budget, max(128, (1 << 19) // u_rows))
    block = 128
    while block * 2 <= min(cap >> 5, budget):
        block *= 2
    block = min(block, tile)
    # The kernel grid is tile // block, so block must divide tile.  Halve
    # until it does (staying under the VMEM budget) rather than silently
    # widening to the whole tile, which for a large non-power-of-two tile
    # would blow VMEM.
    while tile % block != 0 and block > 128:
        block //= 2
    if tile % block != 0:
        raise ValueError(
            f"Pallas render tile {tile} is not a multiple of the minimum "
            f"ray-block width 128; choose cfg.tile_size (or a sample count "
            f"below it) that is a multiple of 128, or use backend='xla'."
        )
    return block


def _render_range_pallas_impl(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> Tuple[jnp.ndarray, RenderStats]:
    if _use_staged(cfg, scene):
        return _render_range_staged_impl(materials, scene, key, cfg, start, count)
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import render_tile_pallas

    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)
    interpret = jax.default_backend() != "tpu"
    fused_rng = _pallas_fused_rng(cfg, interpret)
    block = _pallas_block(
        scene, tile, u_rows=0 if fused_rng else cfg.max_bounces * 8
    )

    def tile_fn(tile_start):
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        uniforms = None if fused_rng else _pallas_uniforms(tkey, cfg, tile)
        rad, st = render_tile_pallas(
            materials,
            scene,
            cfg,
            p.T,
            d.T,
            in_range.astype(jnp.float32)[None, :],
            uniforms,
            block=block,
            interpret=interpret,
            orig=idx[None, :],
            keys=_pallas_keys(key) if fused_rng else None,
        )
        return rad.T, jnp.sum(st[0]), jnp.sum(st[1])

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    vals, segs, shadows = jax.lax.map(tile_fn, starts)
    stats = RenderStats(segments=jnp.sum(segs), shadow_rays=jnp.sum(shadows))
    return vals.reshape(-1, 3)[: count], stats


def _use_staged(cfg: RenderConfig, scene: SceneData) -> bool:
    """Wavefront organisation for the Pallas backend, measured on v5e
    (512x512/64spp/16b):

      * small scenes (the reference's 30 triangles): the single
        megakernel wins — 291.6M vs 54.6M rays/s; per-bounce work is so
        cheap that the staged pipeline's host-side lane re-permutation
        between stages costs more than the dead-lane slots it skips.
      * large scenes (Cornell+sphere, 1298 tris): staged wins — 18.9M
        (reproducible across processes) vs 6.4-9.5M rays/s for mega
        (varies between otherwise-identical runs; Mosaic scheduling of
        the clustered sweep inside the long fori_loop appears
        compile-sensitive, while the staged kernel's short 2-bounce
        stages are stable).  Per-slot cost scales with Tp, so tracking
        the Russian-roulette alive curve pays while the fixed
        permutation overhead stays the same.

    "auto" picks by the same padded-triangle-count threshold the
    cluster-chunked sweep uses; "mega"/"staged" force either path
    (mega is the bit-parity oracle for staged in tests)."""
    if cfg.wavefront not in ("auto", "mega", "staged"):
        raise ValueError(
            f"unknown cfg.wavefront {cfg.wavefront!r}: "
            "expected 'auto', 'mega', or 'staged'"
        )
    if cfg.wavefront == "auto":
        from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
            cluster_k_for,
        )

        return cluster_k_for(scene.vertices.shape[0], cfg) > 0
    return cfg.wavefront == "staged"


def _stage_plan(cfg: RenderConfig) -> Tuple[int, int]:
    """(bounces per stage, number of stages)."""
    k = max(1, min(cfg.stage_bounces, cfg.max_bounces))
    return k, -(-cfg.max_bounces // k)


def _alive_first_order(alive: jnp.ndarray) -> jnp.ndarray:
    """Stable partition permutation: order (tile,) i32 with alive lanes
    first, relative order preserved on both sides.  new[j] =
    old[order[j]].  Implemented as a stable key sort on the dead flag:
    XLA's TPU sort is fully vectorized, while the cumsum+scatter
    alternative lowers the (tile,)-element scatter to a serialized
    update loop (measured slower at tile 65536)."""
    n = alive.shape[0]
    dead = (alive <= 0).astype(jnp.int32)
    _, order = jax.lax.sort(
        (dead, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


def _binned_order(
    carry: jnp.ndarray, lo: jnp.ndarray, inv_ext: jnp.ndarray, cells: int
) -> jnp.ndarray:
    """Alive-first + ray-binned stable permutation for the staged
    wavefront on clustered (large) scenes.

    Key = ((dead · 8 + direction-octant) · cells³) + origin-cell: alive
    lanes still pack strictly before dead ones (the dead-block early
    exit and the bitwise staged≡mega contract only need that — per-lane
    arithmetic is lane-order independent), but within the alive prefix
    lanes are grouped by the sign octant of their next direction and a
    cells³ spatial grid of their next origin (cfg.bin_cells per axis).
    Ray blocks then see directionally/spatially coherent rays, which is
    what lets the cluster sweep's block-wide AABB slab skip
    (`ops/pallas/render_kernel.py _sweep_*`, a lax.cond over
    max-over-lanes) actually fire: with unbinned blocks one stray lane
    forces every cluster.  Classic wavefront ray binning (cf. the
    reference's free per-thread divergence, path_trace.cu:175-181)
    expressed as one XLA sort key."""
    alive = carry[_CAR_ALIVE]
    d = carry[0:3]
    p = carry[3:6]
    n = alive.shape[0]
    dead = (alive <= 0).astype(jnp.int32)
    octant = (
        (d[0] > 0).astype(jnp.int32)
        + 2 * (d[1] > 0).astype(jnp.int32)
        + 4 * (d[2] > 0).astype(jnp.int32)
    )
    cidx = jnp.clip(
        ((p - lo[:, None]) * inv_ext[:, None] * cells).astype(jnp.int32),
        0,
        cells - 1,
    )  # (3, n)
    cell = cidx[0] + cells * (cidx[1] + cells * cidx[2])
    n_cells = cells ** 3
    key = (dead * 8 + octant) * n_cells + cell
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


# Staged-carry row indices (ops/pallas/render_kernel.py CARRY_ROWS).
_CAR_ALIVE, _CAR_RAD, _CAR_SEG, _CAR_SHW = 17, slice(18, 21), 21, 22


def _staged_tile_fwd(
    materials: jnp.ndarray,
    scene: SceneData,
    cfg: RenderConfig,
    key: jax.Array,
    tile_start: jnp.ndarray,
    tile: int,
    block: int,
    interpret: bool,
    fused_rng: bool,
    with_rec: bool,
):
    """Staged-compaction forward pass over one ray tile.

    The bounce loop runs as ceil(max_bounces / stage_bounces) stage
    kernels (ONE compiled kernel — the starting bounce is traced);
    between stages the 24-row lane carry is stable-partitioned so alive
    lanes pack into the leading ray blocks and each block's in-kernel
    while_loop exits once all its lanes are dead.  Per-lane arithmetic
    is identical to the megakernel (dead-lane slots contribute exact
    +0.0), so in rng="external" mode the per-sample radiance is
    BIT-IDENTICAL to the megakernel and float-comparable to the XLA
    oracle — asserted in tests/test_pallas.py.

    Returns (radiance (3, tile) in sample-local order, segments,
    shadows, ys) where ys = (records (S, k*REC_ROWS, tile), orders
    (S, tile), origs (S, tile)) when with_rec (for the staged suffix
    recursion) else None."""
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
        init_tile_pallas,
        stage_tile_pallas,
    )

    k, n_stages = _stage_plan(cfg)
    idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
    in_range = idx < cfg.n_samples
    tkey = jax.random.fold_in(key, tile_start // tile)
    p, d = camera_rays(scene, cfg, tkey, idx)
    carry0 = init_tile_pallas(
        materials, scene, cfg, p.T, d.T,
        in_range.astype(jnp.float32)[None, :], block=block,
        interpret=interpret,
    )
    keys = _pallas_keys(key) if fused_rng else None
    if fused_rng:
        uniforms = None
    else:
        uniforms = _pallas_uniforms(tkey, cfg, tile)
        # Pad to whole stages so the partial-last-stage dynamic slice
        # stays in bounds without shifting row <-> bounce alignment.
        pad_rows = n_stages * k * 8 - uniforms.shape[0]
        if pad_rows:
            uniforms = jnp.concatenate(
                [uniforms, jnp.zeros((pad_rows, tile), uniforms.dtype)], axis=0
            )

    from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
        cluster_k_for,
    )

    clustered = cluster_k_for(scene.vertices.shape[0], cfg) > 0
    if clustered:
        v = scene.vertices.reshape(-1, 3)
        lo = v.min(axis=0)
        ext = v.max(axis=0) - lo
        inv_ext = 1.0 / jnp.where(ext > 0, ext, 1.0)

    def stage_body(st, s):
        carry, orig = st
        if clustered:
            order = _binned_order(carry, lo, inv_ext, cfg.bin_cells)
        else:
            order = _alive_first_order(carry[_CAR_ALIVE])
        carry = carry[:, order]
        orig = orig[order]
        u_s = None
        if uniforms is not None:
            rows = jax.lax.dynamic_slice(
                uniforms, (s * (k * 8), jnp.int32(0)), (k * 8, tile)
            )
            u_s = rows[:, orig - tile_start]
        out = stage_tile_pallas(
            materials, scene, cfg, carry, orig[None, :], s * k, k,
            uniforms=u_s, block=block, interpret=interpret, keys=keys,
            with_rec=with_rec,
        )
        if with_rec:
            carry, rec = out
            return (carry, orig), (rec, order, orig)
        return (out, orig), None

    (carry, orig), ys = jax.lax.scan(
        stage_body, (carry0, idx), jnp.arange(n_stages, dtype=jnp.int32)
    )
    local = orig - tile_start
    rad = jnp.zeros((3, tile), jnp.float32).at[:, local].set(carry[_CAR_RAD])
    return rad, jnp.sum(carry[_CAR_SEG]), jnp.sum(carry[_CAR_SHW]), ys


def _render_range_staged_impl(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> Tuple[jnp.ndarray, RenderStats]:
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)
    interpret = jax.default_backend() != "tpu"
    fused_rng = _pallas_fused_rng(cfg, interpret)
    # The stage kernel's working set carries 2x(CARRY_ROWS, block) in/out
    # on top of the intersect temporaries; the mega-kernel block (8192 at
    # the reference scene) exceeds scoped VMEM, so use the records-size
    # budget (block 4096 — compiles and runs on v5e).
    k, _n_stages = _stage_plan(cfg)
    block = _pallas_block(
        scene, tile, records=True, u_rows=0 if fused_rng else k * 8
    )

    def tile_fn(tile_start):
        rad, segs, shadows, _ = _staged_tile_fwd(
            materials, scene, cfg, key, tile_start, tile, block, interpret,
            fused_rng, with_rec=False,
        )
        return rad.T, segs, shadows

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    vals, segs, shadows = jax.lax.map(tile_fn, starts)
    stats = RenderStats(segments=jnp.sum(segs), shadow_rays=jnp.sum(shadows))
    return vals.reshape(-1, 3)[: count], stats


def _staged_tile_reverse(
    n_tri: int,
    cfg: RenderConfig,
    g: jnp.ndarray,  # (3, tile) radiance cotangent, sample-local order
    ys,  # (records, orders, origs) stacked over stages
    tile_start: jnp.ndarray,
    block: int,
    interpret: bool,
    perm=None,  # kernel_perm(scene, cfg): internal->global triangle map
) -> jnp.ndarray:
    """Staged suffix recursion (reverse bounce order): one
    stage_reverse kernel per stage, the (suf, esc) rows re-permuted to
    the previous stage's lane order between calls.  Returns the (nT, 3)
    material cotangent for the tile."""
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
        stage_reverse_tile_pallas,
        unperm_rows,
    )

    k, _ = _stage_plan(cfg)
    tile = g.shape[1]

    def rev_body(carry, xs):
        suf, dm = carry
        rec_s, order_s, orig_s = xs
        g_s = g[:, orig_s - tile_start]
        dmp, suf_out = stage_reverse_tile_pallas(
            n_tri, cfg, k, rec_s, g_s, suf, block=block, interpret=interpret
        )
        # Back to the PREVIOUS stage's lane order: stage-s lane j was
        # stage-(s-1) lane order_s[j].
        suf_prev = jnp.zeros_like(suf).at[:, order_s].set(suf_out)
        return (suf_prev, dm + dmp), None

    init = (
        jnp.zeros((4, tile), jnp.float32),
        jnp.zeros((n_tri, 3), jnp.float32),
    )
    (_suf, dmats), _ = jax.lax.scan(rev_body, init, ys, reverse=True)
    return unperm_rows(dmats, perm)


def _grad_range_staged(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
    g_vals: jnp.ndarray,
) -> jnp.ndarray:
    """Material gradient via staged replay + staged suffix recursion:
    per tile, re-run the forward stages (deterministic — the alive
    pattern is independent of the materials) streaming per-stage records
    to HBM, then chain the reverse kernels backward through the stage
    permutations."""
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)
    interpret = jax.default_backend() != "tpu"
    fused_rng = _pallas_fused_rng(cfg, interpret)
    k, _n_stages = _stage_plan(cfg)
    block = _pallas_block(
        scene, tile, records=True, u_rows=0 if fused_rng else k * 8
    )
    n_tri = scene.vertices.shape[0]
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import kernel_perm

    perm = kernel_perm(scene, cfg)
    g_pad = jnp.concatenate(
        [g_vals, jnp.zeros((n_tiles * tile - count, 3), g_vals.dtype)], axis=0
    ).reshape(n_tiles, tile, 3)

    def tile_fn(args):
        tile_start, g_tile = args
        _rad, _s, _sh, ys = _staged_tile_fwd(
            materials, scene, cfg, key, tile_start, tile, block, interpret,
            fused_rng, with_rec=True,
        )
        return _staged_tile_reverse(
            n_tri, cfg, g_tile.T, ys, tile_start, block, interpret, perm=perm
        )

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    grads = jax.lax.map(tile_fn, (starts, g_pad))
    return jnp.sum(grads, axis=0)


def _grad_range_pallas(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
    g_vals: jnp.ndarray,
) -> jnp.ndarray:
    """Material gradient via the fused backward megakernel
    (ops/pallas/render_kernel.py grad_tile_pallas): per tile, rebuild the
    primary rays and uniforms exactly as the forward pass did, then one
    kernel replays the bounce loop with records in VMEM and returns the
    (nT, 3) cotangent — no HBM records traffic, no XLA replay."""
    if _use_staged(cfg, scene):
        return _grad_range_staged(
            materials, scene, key, cfg, start, count, g_vals
        )
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import grad_tile_pallas

    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)
    interpret = jax.default_backend() != "tpu"
    fused_rng = _pallas_fused_rng(cfg, interpret)
    block = _pallas_block(
        scene, tile, records=True,
        u_rows=0 if fused_rng else cfg.max_bounces * 8,
    )
    g_pad = jnp.concatenate(
        [g_vals, jnp.zeros((n_tiles * tile - count, 3), g_vals.dtype)], axis=0
    ).reshape(n_tiles, tile, 3)

    def tile_fn(args):
        tile_start, g_tile = args
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        uniforms = None if fused_rng else _pallas_uniforms(tkey, cfg, tile)
        return grad_tile_pallas(
            materials,
            scene,
            cfg,
            p.T,
            d.T,
            in_range.astype(jnp.float32)[None, :],
            g_tile.T,
            uniforms,
            block=block,
            interpret=interpret,
            orig=idx[None, :],
            keys=_pallas_keys(key) if fused_rng else None,
        )

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    grads = jax.lax.map(tile_fn, (starts, g_pad))
    return jnp.sum(grads, axis=0)


def loss_and_grad_range(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
    tile_post,
) -> Tuple[jnp.ndarray, jnp.ndarray, RenderStats]:
    """Fused scalar-loss value AND material gradient over a sample range.

    tile_post(vals (tile, 3), tile_start) -> scalar loss contribution
    for one tile of consecutive samples (contributions are SUMMED across
    tiles; it must mask out-of-range lanes itself, which render as
    zeros).  It runs as ordinary (tiny) XLA and is differentiated with
    jax.vjp, so any per-pixel loss works as long as tile_size % spp == 0
    (whole pixels per tile).

    On the Pallas backend this is the fast training path: per tile, the
    forward megakernel streams its per-bounce records to HBM
    (render_tile_pallas_rec) and a reverse-only kernel
    (reverse_tile_pallas) turns them plus the local loss cotangent into
    the (nT, 3) material gradient — no bounce-loop replay.  jax.grad of
    render_range computes the identical gradient (the custom-VJP
    backward must replay the forward per tile, since whole-range records
    would be ~bounces*64 B/sample of residuals); equality is asserted in
    tests/test_pallas.py.

    Returns (loss, d_materials (nT, 3), stats)."""
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)

    if not _use_pallas(cfg, scene):
        # XLA fallback: identical tile_post semantics (zero-padded tail
        # lanes), gradient via the analytic custom VJP of render_range.
        def total(mats):
            vals, stats = render_range(mats, scene, key, cfg, start, count)
            vals = jnp.concatenate(
                [vals, jnp.zeros((n_tiles * tile - count, 3), vals.dtype)]
            )
            loss = 0.0
            for t in range(n_tiles):
                loss = loss + tile_post(
                    vals[t * tile : (t + 1) * tile], start + t * tile
                )
            return loss, stats

        (loss, stats), g_mats = jax.value_and_grad(total, has_aux=True)(materials)
        return loss, g_mats, stats

    from inverse_path_tracer_tpu.ops.pallas.render_kernel import (
        kernel_perm,
        render_tile_pallas_rec,
        reverse_tile_pallas,
    )

    n_tri = scene.vertices.shape[0]
    interpret = jax.default_backend() != "tpu"
    fused_rng = _pallas_fused_rng(cfg, interpret)
    perm = kernel_perm(scene, cfg)
    staged = _use_staged(cfg, scene)
    k, _n_stages = _stage_plan(cfg)
    block = _pallas_block(
        scene, tile, records=True,
        u_rows=0 if fused_rng else (k if staged else cfg.max_bounces) * 8,
    )

    def tile_fn(carry, tile_start):
        loss, dmats, segs, shadows = carry
        if staged:
            rad, sg, sh, ys = _staged_tile_fwd(
                materials, scene, cfg, key, tile_start, tile, block,
                interpret, fused_rng, with_rec=True,
            )
            lt, vjp = jax.vjp(lambda r: tile_post(r.T, tile_start), rad)
            (g,) = vjp(jnp.ones_like(lt))
            dm = _staged_tile_reverse(
                n_tri, cfg, g, ys, tile_start, block, interpret, perm=perm
            )
            return (loss + lt, dmats + dm, segs + sg, shadows + sh), None
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        uniforms = None if fused_rng else _pallas_uniforms(tkey, cfg, tile)
        rad, st, rec = render_tile_pallas_rec(
            materials,
            scene,
            cfg,
            p.T,
            d.T,
            in_range.astype(jnp.float32)[None, :],
            uniforms,
            block=block,
            interpret=interpret,
            orig=idx[None, :],
            keys=_pallas_keys(key) if fused_rng else None,
        )
        lt, vjp = jax.vjp(lambda r: tile_post(r.T, tile_start), rad)
        (g,) = vjp(jnp.ones_like(lt))
        dm = reverse_tile_pallas(
            n_tri, cfg, rec, g, block=block, interpret=interpret, perm=perm
        )
        return (
            loss + lt,
            dmats + dm,
            segs + jnp.sum(st[0]),
            shadows + jnp.sum(st[1]),
        ), None

    init = (
        jnp.float32(0.0),
        jnp.zeros((n_tri, 3), jnp.float32),
        jnp.float32(0.0),
        jnp.float32(0.0),
    )
    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (loss, dmats, segs, shadows), _ = jax.lax.scan(tile_fn, init, starts)
    return loss, dmats, RenderStats(segments=segs, shadow_rays=shadows)


def _ct_zero(x):
    """A cotangent-compatible zero for any primal (float0 for ints)."""
    import numpy as onp

    if jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return onp.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _render_range_pallas(cfg, count, materials, scene, key, start):
    return _render_range_pallas_impl(materials, scene, key, cfg, start, count)


def _pallas_fwd(cfg, count, materials, scene, key, start):
    out = _render_range_pallas_impl(materials, scene, key, cfg, start, count)
    return out, (materials, scene, key, start)


def _pallas_bwd(cfg, count, res, g):
    """Backward for the Pallas primal.  grad_mode="custom" (default)
    runs the fused backward megakernel (records replay + suffix
    recursion entirely in VMEM); grad_mode="records" keeps the XLA
    records replay (render/diff.py) as the oracle/ablation path — both
    compute the same analytic multilinear VJP."""
    materials, scene, key, start = res
    g_vals, _g_stats = g
    if cfg.grad_mode == "custom":
        g_mats = _grad_range_pallas(
            materials, scene, key, cfg, start, count, g_vals
        )
    else:
        from inverse_path_tracer_tpu.render.diff import grad_from_records_range

        g_mats = grad_from_records_range(
            materials, scene, key, cfg, start, count, g_vals
        )
    return (
        g_mats,
        jax.tree.map(_ct_zero, scene),
        _ct_zero(key),
        _ct_zero(start),
    )


_render_range_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def render_range(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> Tuple[jnp.ndarray, RenderStats]:
    """Radiance for `count` consecutive global sample indices beginning at
    `start` (a multiple of the tile size), streamed in cfg.tile_size
    tiles.  This is the shardable unit: per-sample RNG is keyed by the
    *global* tile index (start//tile), so a render split across N chips
    is bit-identical to the single-chip render.

    cfg.backend selects the XLA wavefront scan or the fused Pallas
    megakernel (flat-shaded scenes; same threefry uniforms in
    rng="external" mode, so the two agree to float tolerance)."""
    if _use_pallas(cfg, scene):
        return _render_range_pallas(cfg, count, materials, scene, key, start)
    return _render_range_xla(materials, scene, key, cfg, start, count)


def _use_pallas(cfg: RenderConfig, scene: SceneData) -> bool:
    """Backend resolution: "pallas" forces the kernels (interpret mode
    off-TPU), "auto" uses them on a real TPU only, "xla" never."""
    if cfg.backend == "xla":
        return False
    if cfg.intersect == "bvh" and len(scene.bvh):
        return False  # the kernels always brute-force; honor the request
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import pallas_available

    if not pallas_available():
        return False
    return cfg.backend == "pallas" or (
        cfg.backend == "auto" and jax.default_backend() == "tpu"
    )


def render_samples(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, RenderStats]:
    """Per-sample radiance for all W*H*spp samples (reference
    renderSample grid path_trace.cu:146-184).

    Returns (radiance (n_samples, 3), RenderStats)."""
    return render_range(
        materials, scene, key, cfg, jnp.int32(0), cfg.n_samples
    )


def render_image(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """Tone-mapped (H, W, 3) float image in [0, 1) — differentiable."""
    samples, _ = render_samples(materials, scene, key, cfg)
    return tonemap_mean(samples, cfg.spp).reshape(cfg.height, cfg.width, 3)


# Module-level jit so repeated calls (e.g. the 100-scene dataset
# generator) share one trace/compile cache instead of re-wrapping —
# a fresh jax.jit per call retraces every time (~20s/scene on axon).
render_image_jit = jax.jit(render_image, static_argnums=(3,))


def render_to_png(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    path: str,
) -> "jnp.ndarray":
    """Render and write a PNG (reference createImage path_trace.cu:227-234,
    stbi_write_png replaced by PIL).  Returns the uint8 image array."""
    from PIL import Image
    import numpy as np

    img = render_image_jit(materials, scene, key, cfg)
    img8 = np.asarray(tonemap_to_uint8(img))
    Image.fromarray(img8, mode="RGB").save(path)
    return img8
