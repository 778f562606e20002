"""Light-transport-graph extraction (the inverse pass).

Capability parity with the reference's libipt `createGraph`
(inv_path_trace.cu:195-208): re-trace the scene with the same camera,
and for every path vertex record an edge (dst <- src) annotated with the
running path weight, the *observed pixel color* of the ray's pixel (read
from the forward-rendered, tone-mapped image), and — for NEE edges — the
emitted radiance.  The eye is node index nT (inv_path_trace.cu:177).

CUDA atomics (Edge::update inv_scene.h:26-36, 14 atomicAdd_system per
edge) become pure-functional segment-sum reductions into dense
(nT+1, nT, ...) grids carried through the bounce scan — the TPU-native
replacement for shared-memory atomics; across chips the grids are psum'd.

Inverse-pass conventions replicated exactly (inv_path_trace.cu):
  * factors[DIFFUSE] = 1/pi if direct else 1 (:8) — the OPPOSITE
    pi-convention of the forward BSDF (SURVEY.md §3.5(a));
  * factors[SPECULAR] = specCoeff/P_SPEC if the path sampled specular,
    else 0 (:13); specular paths are sampled with prob P_SPEC = 0
    (inv_scene.h:5) and shininess is forced to 0 (:118), so the specular
    channel is exactly zero with default config;
  * weight update w *= cos / p_sample / p_RR / (1 - P_SPEC) (:144-145);
  * the indirect edge is recorded BEFORE the RR test (:128 vs :135), so
    the terminal vertex still contributes an edge; a missed ray records
    nothing (:113);
  * compress() (inv_scene.h:87-115): w = log(w_sum + 1), pixel/light
    divided by factors_sum (or 1 if zero), then per-dst row
    normalization of w; only the DIFFUSE channel is exported.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.ops.bsdf import specular_coeff
from inverse_path_tracer_tpu.ops.intersect import intersect_fast, smooth_normal
from inverse_path_tracer_tpu.ops.sampling import (
    pick_emissive,
    sample_emissive_point,
    sample_next_dir,
)
from inverse_path_tracer_tpu.render.forward import camera_rays, _u
from inverse_path_tracer_tpu.scene.build import SceneData

PI = 3.141592653589793

# Per-bounce uniforms are one batched (7, N) threefry draw; row order:
# spec, nee_pick, nee_r1, nee_r2, rr, phi, theta.


class TransportGrids(NamedTuple):
    """Dense edge accumulators; leading dim is the flattened (dst, src)
    grid of (nT+1) * nT bins (dst == nT is the eye row)."""

    w_sum: jnp.ndarray  # (B,)
    pixel_sum: jnp.ndarray  # (B, 2, 3)  [channel: DIFFUSE, SPECULAR]
    light_sum: jnp.ndarray  # (B, 2, 3)
    factors_sum: jnp.ndarray  # (B, 2)
    count: jnp.ndarray  # (B,) edge visit count (Edge::n; not exported)


def _zero_grids(n_tri: int, like: jnp.ndarray) -> TransportGrids:
    b = (n_tri + 1) * n_tri
    z = jnp.zeros((b,), dtype=jnp.float32) * like.sum() * 0.0
    return TransportGrids(
        w_sum=z,
        pixel_sum=jnp.zeros((b, 2, 3)) + z[:, None, None],
        light_sum=jnp.zeros((b, 2, 3)) + z[:, None, None],
        factors_sum=jnp.zeros((b, 2)) + z[:, None],
        count=z,
    )


def _edge_update(
    grids: TransportGrids,
    n_tri: int,
    dst: jnp.ndarray,  # (N,) int32 in [0, nT]
    src: jnp.ndarray,  # (N,) int32 in [0, nT)
    w: jnp.ndarray,  # (N,)
    pixel: jnp.ndarray,  # (N, 3)
    light: jnp.ndarray,  # (N, 3)
    factors: jnp.ndarray,  # (N, 2)
    mask: jnp.ndarray,  # (N,) bool
) -> TransportGrids:
    """Edge::update (inv_scene.h:26-36) for a batch of lanes.

    CUDA atomics become a bilinear reduction: the (dst, src) grid of
    every accumulated quantity v is  G_v = dst_onehot^T @ (src_onehot *
    v) — one thin (nT+1, N) x (N, nT) MXU matmul per quantity, no
    scatters anywhere (TPU scatters serialize; these matmuls don't)."""
    mf = mask.astype(w.dtype)
    dst_oh = (dst[:, None] == jnp.arange(n_tri + 1)[None, :]).astype(w.dtype)
    dst_oh = dst_oh * mf[:, None]  # (N, nT+1); masked lanes vanish
    src_oh = (src[:, None] == jnp.arange(n_tri)[None, :]).astype(w.dtype)

    w_m = w * mf
    wf = w_m[:, None] * factors  # (N, 2)
    # Accumulated quantity columns, in grid layout order:
    # [w, wf0, wf1, wf0*pix(3), wf1*pix(3), wf0*light(3), wf1*light(3), n]
    vals = jnp.concatenate(
        [
            w_m[:, None],
            wf,
            wf[:, 0:1] * pixel,
            wf[:, 1:2] * pixel,
            wf[:, 0:1] * light,
            wf[:, 1:2] * light,
            mf[:, None],
        ],
        axis=1,
    )  # (N, 16)
    # G[d, s, k] = sum_r dst_oh[r,d] src_oh[r,s] vals[r,k].  Two
    # equivalent contraction shapes, picked by scene size (same-process
    # v5e A/B, scripts/sweep_vn_extract.py r05):
    #   * small scenes: ONE (nT+1, N) x (N, nT*16) MXU matmul — at the
    #     reference's 30 triangles this beats the k-loop ~1.6x (one
    #     dispatch, operands read once);
    #   * large scenes: a loop of 16 thin per-k matmuls — at 1298
    #     triangles the fused form's materialized (N, nT*16) operand
    #     (1.4 GB/tile, lane-chunked to 512 MB pieces) made it 1.3x
    #     SLOWER per call (74 vs 56 ms at N=16384); the k-loop is
    #     already the optimal k-chunking there.
    n = w.shape[0]
    cols = n_tri * 16
    if cols <= 8192:
        max_chunk = max(8, (1 << 27) // cols)  # 2^27 f32 = 512 MB
        n_chunks = max(1, -(-n // max_chunk))
        while n % n_chunks:
            n_chunks += 1
        c = n // n_chunks
        # (nT+1, nT*16) row-major is (s, k)-minor, so the flat reshape
        # lands g[(d*nT + s), k] exactly as the grid layout expects.
        g = None
        for i in range(n_chunks):
            sl = slice(i * c, (i + 1) * c)
            sv = (src_oh[sl, :, None] * vals[sl, None, :]).reshape(c, cols)
            gi = dst_oh[sl].T @ sv
            g = gi if g is None else g + gi
        g = g.reshape((n_tri + 1) * n_tri, 16)
    else:
        g = jnp.stack(
            [dst_oh.T @ (src_oh * vals[:, k : k + 1]) for k in range(16)],
            axis=-1,
        ).reshape((n_tri + 1) * n_tri, 16)
    return TransportGrids(
        w_sum=grids.w_sum + g[:, 0],
        factors_sum=grids.factors_sum + g[:, 1:3],
        pixel_sum=grids.pixel_sum + g[:, 3:9].reshape(-1, 2, 3),
        light_sum=grids.light_sum + g[:, 9:15].reshape(-1, 2, 3),
        count=grids.count + g[:, 15],
    )


class _InvState(NamedTuple):
    ray_p: jnp.ndarray
    ray_d: jnp.ndarray
    weight: jnp.ndarray  # (N,)
    factors: jnp.ndarray  # (N, 2) previous-bounce BSDF factors
    dst: jnp.ndarray  # (N,) int32 previous node (nT = eye)
    alive: jnp.ndarray
    grids: TransportGrids


def _inv_bounce(
    scene: SceneData,
    cfg: RenderConfig,
    key: jax.Array,
    pixel_colors: jnp.ndarray,  # (N, 3) observed pixel color per lane
    state: _InvState,
    bounce,
) -> _InvState:
    """One inverse bounce (inv_path_trace.cu radiance :109-150 +
    directLighting :16-87)."""
    n_tri = scene.n_tri
    n = state.ray_p.shape[0]
    u = jax.random.uniform(jax.random.fold_in(key, bounce), (7, n))
    isect = intersect_fast(scene, state.ray_p, state.ray_d, cfg.min_dot, cfg.epsilon)
    hit_act = state.alive & isect.hit
    src = isect.tri

    # Indirect edge: (dst, src, prev weight, pixel, 0, prev factors) (:128).
    grids = _edge_update(
        state.grids,
        n_tri,
        state.dst,
        src,
        state.weight,
        pixel_colors,
        jnp.zeros_like(pixel_colors),
        state.factors,
        hit_act,
    )

    # Path type for THIS vertex (:117-118): specular with prob P_SPEC,
    # shininess forced to 0.
    is_specular = u[0] < cfg.p_spec
    shininess = jnp.zeros((n,), dtype=jnp.float32)

    # --- NEE edge (directLighting :16-87) ---
    if scene.n_emissive > 0:
        u_pick, r1, r2 = u[1], u[2], u[3]
        t_emm, p_t = pick_emissive(scene, u_pick)
        emm_point = sample_emissive_point(scene, t_emm, r1, r2)
        to_light = emm_point - isect.point
        to_light = to_light / jnp.linalg.norm(to_light, axis=-1, keepdims=True)
        shade_n = smooth_normal(scene, src, isect.point)
        cos_theta = jnp.sum(shade_n * to_light, axis=-1)
        ok = hit_act & (cos_theta >= 0.0)
        shadow = intersect_fast(scene, isect.point, to_light, cfg.min_dot, cfg.epsilon)
        ok = ok & shadow.hit
        light_n = smooth_normal(scene, t_emm, shadow.point)
        cos_theta_p = -jnp.sum(light_n * to_light, axis=-1)
        ok = ok & (cos_theta_p >= 0.0) & (shadow.tri == t_emm)

        nee_w = (
            state.weight
            * cos_theta
            * cos_theta_p
            / jnp.where(ok, shadow.t, 1.0) ** 2
            / p_t
        )
        # Inverse BSDF factors, direct variant (:6-14, :79):
        # DIFFUSE = 1/pi; SPECULAR = specCoeff / P_SPEC if specular path.
        spec_c = specular_coeff(shininess, shade_n, state.ray_d, to_light)
        f_spec = jnp.where(
            is_specular, spec_c / max(cfg.p_spec, 1e-30), 0.0
        )
        nee_factors = jnp.stack([jnp.full((n,), 1.0 / PI), f_spec], axis=-1)
        grids = _edge_update(
            grids,
            n_tri,
            src,  # dst = current triangle (:82)
            t_emm,  # src = emissive triangle (:81)
            nee_w,
            pixel_colors,
            scene.emission[t_emm],
            nee_factors,
            ok,
        )

    # --- Russian roulette + next bounce setup (:134-147) ---
    cont = hit_act & (u[4] < cfg.p_rr)
    next_dir, pdf = sample_next_dir(
        scene.face_normal[src], is_specular, shininess, u[5], u[6]
    )
    shade_n2 = smooth_normal(scene, src, isect.point)
    # Indirect factors for the NEXT edge (:142): DIFFUSE = 1.
    spec_c2 = specular_coeff(shininess, shade_n2, state.ray_d, next_dir)
    f_spec2 = jnp.where(is_specular, spec_c2 / max(cfg.p_spec, 1e-30), 0.0)
    next_factors = jnp.stack([jnp.ones((n,)), f_spec2], axis=-1)

    cosine = jnp.sum(next_dir * shade_n2, axis=-1)
    p_branch = jnp.where(is_specular, cfg.p_spec, 1.0 - cfg.p_spec)
    w_next = (
        state.weight
        * cosine
        / jnp.where(pdf > 0, pdf, 1.0)
        / cfg.p_rr
        / p_branch
    )
    w_next = jnp.where(pdf > 0, w_next, 0.0)

    return _InvState(
        ray_p=jnp.where(cont[:, None], isect.point, state.ray_p),
        ray_d=jnp.where(cont[:, None], next_dir, state.ray_d),
        weight=jnp.where(cont, w_next, state.weight),
        factors=jnp.where(cont[:, None], next_factors, state.factors),
        dst=jnp.where(cont, src, state.dst),
        alive=cont,
        grids=grids,
    )


def _inv_uniforms(tkey: jax.Array, cfg: RenderConfig, n: int) -> jnp.ndarray:
    """The XLA inverse loop's per-bounce uniforms stacked for the fused
    kernel: 7 used + 1 zero pad row per bounce (sublane-aligned dynamic
    slices).  Same keys => the two backends see identical randomness."""
    rows = []
    for b in range(cfg.max_bounces):
        u = jax.random.uniform(jax.random.fold_in(tkey, b), (7, n))
        rows.append(jnp.concatenate([u, jnp.zeros((1, n), u.dtype)], axis=0))
    return jnp.concatenate(rows, axis=0)


def _trace_transport_range_pallas(
    scene: SceneData,
    target_image01: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> TransportGrids:
    """Fused-kernel transport extraction
    (ops/pallas/inverse_kernel.py): the whole inverse bounce loop with
    the dense edge grids resident in VMEM."""
    from inverse_path_tracer_tpu.ops.pallas.inverse_kernel import (
        grids_from_acc,
        inverse_tile_pallas,
    )
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import kernel_perm
    from inverse_path_tracer_tpu.render.forward import _pallas_block, _pallas_keys

    n_tri = scene.n_tri
    target_flat = target_image01.reshape(-1, 3)
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)

    interpret = jax.default_backend() != "tpu"
    # Fused counter-hash RNG (pure function of the global sample index,
    # so N-chip grids == 1-chip grids); "fused" forces it anywhere incl.
    # the CPU interpreter, "auto" only on real TPUs.
    fused_rng = cfg.rng == "fused" or (cfg.rng == "auto" and not interpret)
    block = _pallas_block(
        scene, tile, u_rows=0 if fused_rng else cfg.max_bounces * 8
    )

    def tile_fn(tile_start):
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        pix_idx = jnp.clip(idx // cfg.spp, 0, cfg.width * cfg.height - 1)
        pixel_colors = target_flat[pix_idx]
        uniforms = None if fused_rng else _inv_uniforms(tkey, cfg, tile)
        return inverse_tile_pallas(
            scene,
            cfg,
            p.T,
            d.T,
            in_range.astype(jnp.float32)[None, :],
            pixel_colors.T,
            uniforms,
            block=block,
            interpret=interpret,
            orig=idx[None, :],
            keys=_pallas_keys(key) if fused_rng else None,
        )

    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    accs = jax.lax.map(tile_fn, starts)
    return grids_from_acc(
        jnp.sum(accs, axis=0), n_tri, perm=kernel_perm(scene, cfg)
    )


def _grids_from_edge_records(
    rec: jnp.ndarray,  # (bounces*REC_INV_ROWS, tile) from the rec kernel
    pix: jnp.ndarray,  # (tile, 3) observed pixel colors
    scene: SceneData,
    cfg: RenderConfig,
    perm,  # kernel_perm(scene, cfg): internal -> global, or None
) -> jnp.ndarray:
    """One tile's streamed edge records -> dense (n_bins, 9) quantity
    grid (the rec-mode counterpart of the in-kernel VMEM accumulator).

    TPU-native segment reduction without scatters OR O(nT^2)-per-lane
    one-hot matmuls: flatten the 2 edges/bounce/lane to (M,) bin keys
    (bin = dst*(nT) + src, masked lanes -> a sentinel bin), argsort the
    keys, cumsum the sorted (M, 9) quantity rows once, and read every
    bin's total as a difference of cumsums at its searchsorted range —
    all fully vectorized.  The f32 running cumsum costs ~eps * (prefix
    total) of absolute error on small bins (documented; the vn parity
    test bounds it), which is far below the Monte-Carlo noise of the
    estimates themselves.

    Quantity columns match edge_grid: [w, w*f0, w*f0*pix(3),
    w*f0*light(3), n]."""
    n_tri = scene.n_tri
    b = cfg.max_bounces
    tile = rec.shape[1]
    r = rec.reshape(b, 8, tile)
    dst_i = r[:, 0].astype(jnp.int32)  # internal; n_tri == eye
    src_i = r[:, 1].astype(jnp.int32)
    hit = r[:, 2]
    w = r[:, 3]
    ok = r[:, 4]
    nee_w = r[:, 5]
    e_i = r[:, 6].astype(jnp.int32)
    if perm is not None:
        to_g = jnp.concatenate([perm, jnp.asarray([n_tri])]).astype(jnp.int32)
        dst_g = to_g[jnp.clip(dst_i, 0, n_tri)]
        src_g = to_g[jnp.clip(src_i, 0, n_tri - 1)]
        e_g = to_g[jnp.clip(e_i, 0, n_tri - 1)]
    else:
        dst_g, src_g, e_g = dst_i, src_i, e_i

    n_bins = (n_tri + 1) * n_tri
    pix_b = jnp.broadcast_to(pix.T[None], (b, 3, tile))  # (b, 3, tile)

    def quant(w_, f0, light, mask):
        # Mask with where, NOT multiplication: a masked lane's recorded
        # fields may be NaN (e.g. a degenerate NEE draw toward a
        # co-located light point normalizes a ~zero vector before the
        # ok-mask kills it), and NaN * 0 == NaN would poison the whole
        # cumsum.  The in-kernel accumulator never exposes these only
        # because its one-hot dst column is rebuilt from the mask;
        # here the raw per-lane values are the stream.
        wm = jnp.where(mask > 0, w_, 0.0)
        wf = wm * f0
        return jnp.stack(
            [
                wm,
                wf,
                wf * pix_b[:, 0],
                wf * pix_b[:, 1],
                wf * pix_b[:, 2],
                wf * light[:, 0],
                wf * light[:, 1],
                wf * light[:, 2],
                mask,
            ],
            axis=-1,
        )  # (b, tile, 9)

    zeros3 = jnp.zeros((b, 3, tile), jnp.float32)
    # Indirect edge (factors[DIFFUSE]=1, light=0).
    k_ind = jnp.where(hit > 0, dst_g * n_tri + src_g, n_bins)
    v_ind = quant(w, 1.0, zeros3, hit)
    # NEE edge (factors[DIFFUSE]=1/pi, light = chosen emissive's L_o).
    light = scene.emission[e_g].transpose(0, 2, 1)  # (b, 3, tile)
    k_nee = jnp.where(ok > 0, src_g * n_tri + e_g, n_bins)
    v_nee = quant(nee_w, 1.0 / PI, light, ok)

    keys = jnp.concatenate([k_ind.reshape(-1), k_nee.reshape(-1)])
    vals = jnp.concatenate([v_ind.reshape(-1, 9), v_nee.reshape(-1, 9)])
    order = jnp.argsort(keys)
    k2 = keys[order]
    v2 = vals[order]
    # Compensated (double-float) cumulative sum: the reference-quirk
    # path weights reach ~1e7, so a tile's running f32 total reaches
    # ~1e13 and plain-cumsum differences lose EVERYTHING below
    # ulp(total) ~ 1e6 — small bins came back as large negative garbage
    # and log(w_sum + 1) went NaN on hardware (the round-4 records-path
    # known issue; CPU tests at tiny M never reached the scale).  A
    # (hi, lo) two-float carry keeps ~2^-48 relative error, and the
    # boundary difference (hi[r] - hi[l] is Sterbenz-exact for nearby
    # values) recovers small bins to ~ulp(lo) absolute.
    # Implementation note: a textbook two-sum associative_scan never
    # finished remote-compiling on the tunneled chip; this equivalent
    # uses only plain cumsums.  Adjacent cumsum differences are
    # Sterbenz-exact in this regime (|v_i| << running total), so
    # e = v - diff(c) is each step's EXACT rounding error and its own
    # cumsum is the missing low-order mass.
    c_hi = jnp.cumsum(v2, axis=0)
    z = jnp.zeros((1, 9), jnp.float32)
    d = jnp.diff(c_hi, axis=0, prepend=z)
    c_lo = jnp.cumsum(v2 - d, axis=0)
    c_hi = jnp.concatenate([z, c_hi], axis=0)
    c_lo = jnp.concatenate([z, c_lo], axis=0)
    bins = jnp.arange(n_bins, dtype=keys.dtype)
    # Bin lookup: searchsorted with method="sort" (co-sort queries and
    # keys) instead of the default binary search — the r05 decomposition
    # (scripts/sweep_vn_extract.py) measured the default's 21-step
    # gathered binary search as 65% of the whole reduction (0.52 s of
    # 0.80 s per 2.1M-record tile on v5e) while the sort-method costs
    # 0.063 s; and since `bins` is the complete range, left boundaries
    # are just the right boundaries shifted ([0] ++ right[:-1]) — the
    # second searchsorted is free.  Validated bit-exact against the
    # two-searchsorted form on TPU and CPU.
    right = jnp.searchsorted(k2, bins, side="right", method="sort")
    left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
    # NOTE: no clamping — quirk-mode path weights can be legitimately
    # negative on vn scenes (cosine against the smooth normal), and the
    # XLA oracle / dense-acc kernel accumulate them signed.
    return (c_hi[right] - c_hi[left]) + (c_lo[right] - c_lo[left])


def _trace_transport_range_pallas_rec(
    scene: SceneData,
    target_image01: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> TransportGrids:
    """Large-scene fused extraction: the records-mode inverse kernel
    traces each tile (cluster-chunked intersects, smooth shading all
    in-kernel) and the XLA sort/segment reduction accumulates the dense
    grid — no O(nT^2) VMEM accumulator, so scene size is bounded by HBM
    (the dense grid itself), exactly like the reference's
    atomics-into-managed-memory createGraph (inv_path_trace.cu:195)."""
    from inverse_path_tracer_tpu.ops.pallas.inverse_kernel import (
        inverse_tile_pallas_rec,
    )
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import kernel_perm
    from inverse_path_tracer_tpu.render.forward import _pallas_block, _pallas_keys

    n_tri = scene.n_tri
    target_flat = target_image01.reshape(-1, 3)
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)
    interpret = jax.default_backend() != "tpu"
    fused_rng = cfg.rng == "fused" or (cfg.rng == "auto" and not interpret)
    block = _pallas_block(
        scene, tile, records=True,
        u_rows=0 if fused_rng else cfg.max_bounces * 8,
    )
    perm = kernel_perm(scene, cfg)

    def tile_fn(dense, tile_start):
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        pix_idx = jnp.clip(idx // cfg.spp, 0, cfg.width * cfg.height - 1)
        pixel_colors = target_flat[pix_idx]
        uniforms = None if fused_rng else _inv_uniforms(tkey, cfg, tile)
        rec = inverse_tile_pallas_rec(
            scene,
            cfg,
            p.T,
            d.T,
            in_range.astype(jnp.float32)[None, :],
            pixel_colors.T,
            uniforms,
            block=block,
            interpret=interpret,
            orig=idx[None, :],
            keys=_pallas_keys(key) if fused_rng else None,
        )
        dense = dense + _grids_from_edge_records(
            rec, pixel_colors, scene, cfg, perm
        )
        return dense, None

    dense0 = jnp.zeros(((n_tri + 1) * n_tri, 9), jnp.float32)
    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    dense, _ = jax.lax.scan(tile_fn, dense0, starts)
    z1 = jnp.zeros_like(dense[:, 0])
    z3 = jnp.zeros_like(dense[:, 2:5])
    return TransportGrids(
        w_sum=dense[:, 0],
        pixel_sum=jnp.stack([dense[:, 2:5], z3], axis=1),
        light_sum=jnp.stack([dense[:, 5:8], z3], axis=1),
        factors_sum=jnp.stack([dense[:, 1], z1], axis=1),
        count=dense[:, 8],
    )


def trace_transport_range(
    scene: SceneData,
    target_image01: jnp.ndarray,  # (H, W, 3) float in [0,1] (PNG / 255)
    key: jax.Array,
    cfg: RenderConfig,
    start: jnp.ndarray,
    count: int,
) -> TransportGrids:
    """Accumulate transport grids for `count` samples starting at `start`
    (the shardable unit; grids from shards/chips sum).

    cfg.backend selects the XLA wavefront scan (the general/oracle path)
    or the fused Pallas inverse megakernel (flat-shaded scenes with
    p_spec == 0; tests/test_pallas_inverse.py asserts equality)."""
    from inverse_path_tracer_tpu.render.forward import _use_pallas

    # The fused kernel carries the dense (nT+1, 9*Tp) edge accumulator
    # in VMEM — ~40 KB at the reference's 30 triangles but O(nT^2): a
    # 1300-triangle scene would need ~60 MB of the 16 MB budget.  Past
    # ~256 triangles (>= ~2.4 MB + bounce working set, measured safe on
    # v5e) the records-mode kernel takes over: the SAME fused trace, but
    # per-bounce edge fields stream to HBM and an XLA sort/segment
    # reduction builds the grid — scene size is then bounded by HBM like
    # the reference's managed-memory atomics (inv_path_trace.cu:195),
    # with no VMEM cliff.  The XLA wavefront path remains the oracle and
    # the p_spec > 0 implementation.
    if cfg.p_spec == 0.0 and _use_pallas(cfg, scene):
        n_t = scene.vertices.shape[0]
        acc_mb = (n_t + 8) * 9 * (n_t + 8) * 4 / 2**20
        if acc_mb <= 2.5:
            return _trace_transport_range_pallas(
                scene, target_image01, key, cfg, start, count
            )
        return _trace_transport_range_pallas_rec(
            scene, target_image01, key, cfg, start, count
        )
    n_tri = scene.n_tri
    target_flat = target_image01.reshape(-1, 3)
    tile = min(cfg.tile_size, count)
    n_tiles = -(-count // tile)

    def tile_fn(carry_grids, tile_start):
        idx = tile_start + jnp.arange(tile, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        tkey = jax.random.fold_in(key, tile_start // tile)
        p, d = camera_rays(scene, cfg, tkey, idx)
        pix_idx = jnp.clip(idx // cfg.spp, 0, cfg.width * cfg.height - 1)
        pixel_colors = target_flat[pix_idx]
        zero3 = p * 0.0
        state = _InvState(
            ray_p=p,
            ray_d=d,
            weight=zero3[:, 0] + 1.0,
            factors=jnp.stack([zero3[:, 0] + 1.0, zero3[:, 0] + 1.0], axis=-1),
            dst=jnp.full((tile,), n_tri, dtype=jnp.int32) + (idx * 0),
            alive=in_range,
            grids=carry_grids,
        )
        step = jax.checkpoint(
            lambda s, b: (_inv_bounce(scene, cfg, tkey, pixel_colors, s, b), None)
        )
        state, _ = jax.lax.scan(step, state, jnp.arange(cfg.max_bounces, dtype=jnp.int32))
        return state.grids, None

    grids0 = _zero_grids(n_tri, jnp.float32(0.0))
    starts = start + jnp.arange(n_tiles, dtype=jnp.int32) * tile
    grids, _ = jax.lax.scan(tile_fn, grids0, starts)
    return grids


def compress_grids(grids: TransportGrids, n_tri: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DataWrapper::compress (inv_scene.h:87-115): returns
    (w (nT+1, nT) row-normalized log weights,
     pixel (nT+1, nT, 3) DIFFUSE channel,
     light (nT+1, nT, 3) DIFFUSE channel).

    The log's argument is clamped at zero: on smooth-shaded (vn) scenes
    quirk-mode path weights can go negative (sampled direction below
    the SMOOTH normal while the pdf cosine uses it), so a bin's w_sum
    can be legitimately < -1 and logf would return NaN — as the
    reference's own compress would, but the reference only ever runs
    flat scenes (where weights are non-negative and the clamp is an
    exact no-op)."""
    w = jnp.log(jnp.maximum(grids.w_sum, 0.0) + 1.0).reshape(n_tri + 1, n_tri)
    f = grids.factors_sum
    denom = jnp.where(f != 0.0, f, 1.0)  # (B, 2)
    pixel = (grids.pixel_sum / denom[:, :, None])[:, 0, :].reshape(n_tri + 1, n_tri, 3)
    light = (grids.light_sum / denom[:, :, None])[:, 0, :].reshape(n_tri + 1, n_tri, 3)
    row = w.sum(axis=1, keepdims=True)
    w = jnp.where(row != 0.0, w / jnp.where(row != 0.0, row, 1.0), 0.0)
    return w, pixel, light


def extract_graph(
    scene: SceneData,
    target_image01: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-image transport extraction (reference generate_data
    ipt_cuda.py:136-165, single chip).  Returns (w, pixel, light)."""
    grids = trace_transport_range(
        scene, target_image01, key, cfg, jnp.int32(0), cfg.n_samples
    )
    return compress_grids(grids, scene.n_tri)
