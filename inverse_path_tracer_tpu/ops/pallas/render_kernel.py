"""Fused forward-render and backward-gradient kernels (Pallas/Mosaic).

The whole bounce loop — intersect, NEE (with its second intersect),
BSDF, RR, direction sampling, radiance accumulation — runs inside
kernels with every intermediate resident in VMEM.  This is the TPU
analogue of the reference's renderSample CUDA megakernel
(path_trace.cu:146-184), minus the divergence: lanes are masked, trips
are fixed.

Two kernel organisations share one bounce body (_make_bounce):

  * mega (render_tile_pallas / grad_tile_pallas / *_rec / reverse):
    all cfg.max_bounces bounces in ONE kernel per ray block.  Simple,
    zero orchestration overhead — but every bounce slot pays full SIMD
    width even though Russian roulette + escapes kill most lanes early
    (expected live bounces ~4-5 of 16 at p_rr=.9 on the Cornell scene).

  * staged (init_tile_pallas / stage_tile_pallas /
    stage_reverse_tile_pallas): the bounce loop is split into stages of
    cfg.stage_bounces bounces; between stages the HOST program (XLA, see
    render/forward.py _render_range_staged_impl) stable-partitions the
    24-row lane carry so alive lanes pack into the leading ray blocks,
    and each block's in-kernel while_loop exits as soon as ALL of its
    lanes are dead.  Dead blocks cost ~a DMA; live work tracks the
    actual alive curve instead of the worst case.  The stage kernel
    takes the starting bounce as a traced SMEM scalar, so ONE compiled
    kernel serves every stage via lax.scan.

Layout: rays live on the LANE axis.  Every per-ray quantity is
(k, BLOCK) with k on sublanes (vec3 -> 3 rows, per-triangle sweeps ->
(Tp, BLOCK) where Tp = nT rounded up to 8), so nT=30 pads to 32 sublanes
instead of the 30->128 lane padding a (R, T) layout would pay.  The four
per-triangle plane tests (hit plane + 3 edge planes) are packed into a
single (4*Tp, 4) x (4, 2*BLOCK) MXU matmul per intersect — origins and
directions share the rhs — instead of eight K=4 dispatches.  Hit-value
lookup is one (16,Tp)x(Tp,BLOCK) matmul against a one-hot selection
rebuilt from the carried hit index (ties resolve to the lowest triangle
index — the reference's scan order).

RNG, two modes (cfg.rng):
  * external — the kernels consume the SAME threefry uniforms as the
    XLA path (generated outside, passed in as a (bounces*8, tile)
    input), so the backends produce bit-comparable radiance — the XLA
    renderer is the oracle in tests/test_pallas.py.
  * fused — counter-based in-kernel hash RNG: uniform (sample, bounce,
    slot) is a pure function of the render key words and the GLOBAL
    sample index (murmur3-fmix32 double mix), so streams are invariant
    under tiling, sharding, AND lane compaction: N-chip renders are
    bit-identical to 1-chip per sample, the backward replay trivially
    reproduces the forward streams, and (unlike the stateful
    pltpu.prng_random_bits this replaces) the mode runs under the CPU
    interpreter, so its gradients are finite-difference-checked in the
    test suite, not just on hardware.

Gradients (grad_tile_pallas / the staged reverse): the radiance
estimator is multilinear in the per-bounce diffuse albedos (see
render/diff.py for the derivation), so the backward pass
  1. replays the forward bounce loop, writing the 16 rows/bounce of
     records (f, c, nee, pm, coeff, tri, hit, escape) into VMEM scratch
     (mega) or streaming per-stage records to HBM (staged);
  2. runs the suffix recursion in reverse bounce order, carrying
     suffix/escape lanes and accumulating the material cotangent with
     one (3,B)x(Tp,B)^T lane-contraction matmul per bounce;
  3. accumulates the per-block (3, Tp) gradient into the output across
     the (sequential) grid.
Equality with jax.grad of the XLA path is asserted in
tests/test_pallas.py for both quirk modes.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PI = 3.141592653589793

# Precision policy (measured on v5e, 512x512/64spp/16b):
#
# The MXU's DEFAULT precision rounds both matmul operands to bf16 (one
# pass).  Left uncorrected, that quantizes the learnable Kd to ~3
# decimal digits — it halves directional gradients and turns
# finite-difference checks into noise (ratio 0.04 at the bench config).
# But running every dot at Precision.HIGHEST (6 f32 passes) costs 2.56x
# forward throughput (294M -> 115M rays/s), a 22-minute Mosaic compile,
# and tips the inverse kernel over scoped VMEM (25.9M > 16M).
#
# The shipped policy exploits two structural facts instead:
#
#   * GEOMETRY is material-INDEPENDENT: its bf16 quantization is a fixed
#     deterministic perturbation shared by the forward eval, both FD
#     evals, and the backward replay — gradients remain exactly
#     self-consistent, and the ~0.2% hit-point wobble is far below the
#     Monte-Carlo noise the golden bounds budget for.  All geometry dots
#     (intersects, emissive-table lookups, edge-grid contractions) run
#     at one-pass GEO precision.
#   * The one-hot selection operand is EXACT in bf16, so every
#     material-carrying product can be made f32-exact by hi/lo
#     splitting the OTHER operand: Kd ships in the table as a
#     bf16-exact hi row-triple plus a lo remainder (see _pack_tables),
#     and the backward cotangent contraction splits ct the same way —
#     two one-pass dots instead of six passes over everything.
#
# Validated on hardware: bench.py grad_fd ratio 1.005, golden mean
# 3.7/255 (BENCH_r03).
#
# GEO is an explicit DEFAULT (not None): the package __init__ raises the
# GLOBAL default to 'highest' for the XLA oracle paths, so None here
# would silently inherit the 6-pass mode.
GEO = jax.lax.Precision.DEFAULT

# Rows per bounce in the backward records scratch (8-aligned so the
# dynamic sublane slices are legal for Mosaic): f(3) c(3) nee(3) pm(3)
# coeff(1) tri(1) hit(1) escape(1).
REC_ROWS = 16

# Staged-wavefront lane carry, (CARRY_ROWS, tile) f32 rows:
# d 0:3, point 3:6, hit 6, idx 7, l_e 8:11, l_d 11:14, prev_mult 14:17,
# alive 17, radiance 18:21, segments 21, shadow 22, pad 23.
CARRY_ROWS = 24

# Cluster-chunked sweep (large scenes): contiguous-index clusters of
# cluster_k triangles (kernel-internal Morton/size order, see
# _morton_order), enabled when the padded triangle count reaches
# CLUSTER_MIN_TP.  IPT_CLUSTER_K overrides the auto width process-wide;
# cfg.cluster_k overrides per-config.
CLUSTER_K = int(os.environ.get("IPT_CLUSTER_K", 0))
CLUSTER_MIN_TP = int(os.environ.get("IPT_CLUSTER_MIN_TP", 512))


def cluster_k_for(n_tri: int, cfg) -> int:
    """Resolved cluster width for the chunked sweep (0 = dense).

    Auto policy (cfg.cluster_k == 0 and no IPT_CLUSTER_K): k = half the
    padded triangle count, clamped to [256, 1024] and rounded up to a
    multiple of 128 — i.e. ONE always-swept hot segment (the scene's
    largest triangles) plus one-or-few gated cold segments.  The
    measured v5e response surface on the 1298-tri vn sphere
    (512x512/64spp, same-process sweeps, 2026-08-20) is FLAT within ~8%
    for k in {512..1536} x block in {128..512} and falls off sharply for
    fine clusters (k=128: 0.73x, k=32: 0.39x — per-visit machinery
    dominates because the union-pair skip masks fire most gated
    clusters anyway); k = tp/2 = 768 was the measured optimum (27.3M
    rays/s vs 18.9M for the round-3 k=128 policy).

    As a static RenderConfig field cfg.cluster_k participates in jit
    cache keys, so same-process A/B sweeps are sound."""
    tp8 = _round_up(max(n_tri, 8), 8)
    if tp8 < CLUSTER_MIN_TP:
        return 0
    for k in (cfg.cluster_k, CLUSTER_K):
        if k:
            # A non-multiple-of-8 override makes _pack_tables' padded
            # width non-sublane-aligned — a Mosaic layout failure that
            # only manifests on hardware; round up rather than crash.
            if k < 0:
                raise ValueError(f"cluster_k must be positive, got {k}")
            return _round_up(k, 8)
    return min(1024, max(256, _round_up(tp8 // 2, 128)))


def _morton_codes(cent: jnp.ndarray, lo, inv_ext) -> jnp.ndarray:
    """(nT,) int32 Morton (Z-order) codes of triangle centroids: 10
    quantized bits per axis, bit-interleaved x|y|z."""
    q = jnp.clip(((cent - lo) * inv_ext * 1024.0).astype(jnp.int32), 0, 1023)

    def expand(v):  # spread 10 bits to every 3rd position
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return expand(q[:, 0]) | (expand(q[:, 1]) << 1) | (expand(q[:, 2]) << 2)


def _morton_order(scene, hot: int = 0) -> jnp.ndarray:
    """(nT,) int32 internal->global triangle order: the `hot` largest
    triangles (by AABB diagonal) first, the rest by centroid Morton
    code (stable, so equal keys keep global order).

    The hot prefix fills the kernel's FIRST cluster, which sweeps
    unconditionally: large triangles (walls, floors) are hit by ~every
    ray block, and leaving them inside Morton clusters would inflate
    every cluster AABB they touch until no cluster is ever skipped —
    the measured failure mode of pure Morton ordering on
    Cornell+sphere, where 18 wall triangles poisoned the skip masks."""
    cent = scene.vertices.mean(axis=1)  # (nT, 3)
    lo = cent.min(axis=0)
    ext = cent.max(axis=0) - lo
    inv_ext = 1.0 / jnp.where(ext > 0, ext, 1.0)
    codes = jnp.clip(_morton_codes(cent, lo, inv_ext), 0, (1 << 30) - 1)
    if hot <= 0:
        return jnp.argsort(codes, stable=True)
    tlo = scene.vertices.min(axis=1)
    thi = scene.vertices.max(axis=1)
    size = jnp.sum((thi - tlo) ** 2, axis=-1)
    # rank[i] = position of triangle i in descending-size order.
    rank = jnp.argsort(jnp.argsort(-size, stable=True), stable=True)
    is_hot = rank < hot
    # Composite key: hot group (rank) strictly before cold (morton);
    # both sub-keys fit 30 bits, the group bit sits at 2^30.
    key = jnp.where(is_hot, rank, (1 << 30) + codes)
    return jnp.argsort(key, stable=True)


def kernel_perm(scene, cfg):
    """Internal->global triangle order for the clustered kernels, or
    None (dense scenes keep global order).

    The cluster-chunked sweep skips a cluster when no ray in the block
    hits its AABB, so skip quality is set by how COMPACT cluster AABBs
    are.  Mesh files emit index-contiguous but spatially *striped* runs
    (a lat-long sphere's rings each span the full circumference: a
    128-triangle run is a thin slab as wide as the whole object, which
    every nearby ray's interval hits).  Sorting triangles by the Morton
    code of their centroid makes contiguous runs spatially compact 3-D
    patches, so far fewer clusters are entered per block.

    The permutation is kernel-INTERNAL: global triangle indices remain
    the behavioral contract everywhere outside (`order[i]` = the global
    index living at kernel row i; wrappers map material gradients and
    transport grids back with `order`).  In-kernel tie-breaking resolves
    to the lowest INTERNAL index; exact-t ties between distinct
    triangles are measure-zero (shared-edge hits).

    NOTE on parity contracts for clustered/vn scenes: grazing
    re-intersections on curved geometry (a bounce ray leaving the
    surface and re-hitting it just past EPSILON) can put two
    triangles' hit resolutions within an ulp of each other, where the
    winner depends on compiler instruction selection (FMA contraction)
    — two compilations of the SAME math can disagree, independent of
    this permutation.  Flat-scene tests keep the bitwise XLA<->Pallas
    contract; vn-scene tests bound the (benign, ~1e-2 of lanes)
    knife-edge attribution flips instead (tests/test_pallas.py)."""
    ck = cluster_k_for(scene.vertices.shape[0], cfg)
    if ck == 0:
        return None
    if getattr(cfg, "tri_order", "morton") != "morton":
        return None
    return _morton_order(scene, hot=ck)

# pl is imported lazily so CPU-only environments without pallas work.
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def pallas_available() -> bool:
    return pl is not None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _BounceOut(NamedTuple):
    """Per-bounce outputs shared by the fwd/bwd kernels (all (k, B))."""

    contrib: jnp.ndarray  # (3,B) masked radiance increment pm * c
    f: jnp.ndarray  # (3,B) throughput factor bsdf*coeff (0 when dead)
    c: jnp.ndarray  # (3,B) masked contribution l_e + l_d
    nee: jnp.ndarray  # (3,B) material-independent NEE factor l_o*geom*ok
    pm_in: jnp.ndarray  # (3,B) throughput entering this bounce
    coeff: jnp.ndarray  # (1,B) cosine/pdf/p_RR (0 when dead)
    tri_f: jnp.ndarray  # (1,B) hit triangle index as f32 (0 on miss)
    hit: jnp.ndarray  # (1,B) 0/1 alive-and-hit
    esc: jnp.ndarray  # (1,B) 0/1 alive-in but missed (quirk Q2 lanes)
    seg: jnp.ndarray  # (1,B) segment count increment
    shadow: jnp.ndarray  # (1,B) shadow-ray count increment


class _Geom(NamedTuple):
    """Shared in-kernel geometry helpers (closures over pmat/block)."""

    intersect: object
    intersect_pair: object
    normalize3: object
    dot3: object
    spec_coeff: object
    rotate_z_to: object
    smooth_at: object
    iota_t: jnp.ndarray
    iota_tf: jnp.ndarray
    ones_row: jnp.ndarray
    zeros_row: jnp.ndarray


def _make_geom(tp, pmat, block, min_dot, epsilon, cab=None, cluster_k=0,
               pair_split=False, fast_recip=False) -> _Geom:
    ones_row = jnp.ones((1, block), dtype=jnp.float32)
    zeros_row = jnp.zeros((1, block), dtype=jnp.float32)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (tp, block), 0)
    iota_tf = iota_t.astype(jnp.float32)
    n_clusters = tp // cluster_k if cluster_k else 0

    def _t_masked_rows(a, bb, k):
        """Per-triangle plane resolution over k rows: t where the plane
        test + 3 edge signed-distance tests pass, +inf elsewhere."""
        a0 = a[0:k]
        b0 = bb[0:k]
        if fast_recip:
            # Approximate reciprocal + ONE Newton step: r1 = r*(2 - x*r)
            # squares the hardware approximation's relative error
            # (~2e-3 -> ~4e-6), far below the EPSILON=1e-2 hit
            # semantics and the accepted bf16 geometry wobble, while
            # still skipping the full-precision divide (measured +6-8%
            # fwd on v5e; raw approx without the Newton step moves hit
            # points by ~1e-2*t and fails the golden gate).
            r = pl.reciprocal(-b0, approx=True)
            t = a0 * (r * (2.0 + b0 * r))
        else:
            t = a0 / (-b0)
        # max over the 3 edge signed distances <= 0 fuses the three
        # per-edge compare+and chains into one compare (NaN rows — from
        # t=inf with b_j=0 — propagate through maximum and fail the
        # compare, exactly like the per-edge NaN compares did).  A/B'd
        # back-to-back on v5e against three independent compare+and
        # chains: the fused form is ~1.5x faster on the vn scene (the
        # tunneled chip's throughput drifts ~20% between sessions, so
        # only same-process comparisons are trusted).
        sd = jnp.maximum(
            a[k : 2 * k] + t * bb[k : 2 * k],
            jnp.maximum(
                a[2 * k : 3 * k] + t * bb[2 * k : 3 * k],
                a[3 * k : 4 * k] + t * bb[3 * k : 4 * k],
            ),
        )
        inside = (jnp.abs(b0) >= min_dot) & (t >= epsilon) & (sd <= 0.0)
        return jnp.where(inside, t, jnp.inf)

    def _resolve(t_best, idx_raw_f, p, d):
        hit = jnp.isfinite(t_best)
        idx_f = jnp.where(hit, idx_raw_f, 0.0)
        t_safe = jnp.where(hit, t_best, 0.0)
        point = p + d * t_safe
        # hit as f32 0/1: the tuple is carried across the bounce loop
        # and Mosaic cannot legalize boolean vectors in loop carries.
        return t_best, hit.astype(jnp.float32), idx_f, point

    def _finish(a, bb, p, d):
        """Closest-hit resolution from the projected plane values:
        a = origin·planes (4Tp rows: face plane then 3 edge planes),
        bb = direction·planes.  Returns (t_best (1,B), hit (1,B) f32
        0/1, idx_f (1,B) f32 hit index masked to 0 on miss,
        point (3,B))."""
        t_masked = _t_masked_rows(a, bb, tp)
        t_best = jnp.min(t_masked, axis=0, keepdims=True)  # (1, B)
        idx = jnp.argmin(t_masked, axis=0).astype(jnp.int32)[None, :]  # (1, B)
        return _resolve(t_best, idx.astype(jnp.float32), p, d)

    # --- Cluster-chunked sweep (large scenes; cluster_k > 0) -----------
    # Triangles are processed in contiguous index-clusters of K rows; a
    # per-cluster AABB slab test lets the whole ray block skip clusters
    # none of its rays can hit (lax.cond), and the per-chunk working set
    # is (4K, B) instead of (4Tp, B).  Results fold into a running
    # (t_best, idx) min that is bit-identical to the dense sweep: the
    # per-triangle t values are the same MXU rows, min is associative,
    # and the strict `<` update preserves the lowest-index tie rule
    # because clusters are visited in ascending index order.

    def _chunk_rows(c):
        """(4K, 4) plane rows of cluster c (static slices of the
        plane-major pmat)."""
        k = cluster_k
        return jnp.concatenate(
            [pmat[j * tp + c * k : j * tp + c * k + k] for j in range(4)],
            axis=0,
        )

    def _inv_dir(d):
        """Safe reciprocal direction for slab tests: exact-zero
        components become +-1e-20 (direction is normalized, so this only
        rescales the degenerate axis; the interval stays conservative)."""
        tiny = jnp.where(d < 0, -1e-20, 1e-20)
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)

    def _slab_rows(c, p, inv_d):
        """(1, B) f32 0/1: does each lane's ray [0, inf) hit cluster c's
        (margin-padded) AABB?"""
        lo = cab[0:3, c : c + 1]
        hi = cab[3:6, c : c + 1]
        t1 = (lo - p) * inv_d
        t2 = (hi - p) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=0, keepdims=True)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=0, keepdims=True)
        return (tmax >= jnp.maximum(tmin, 0.0)).astype(jnp.float32)

    def _fold_chunk(tm, c, t_b, i_b):
        t_c = jnp.min(tm, axis=0, keepdims=True)
        i_c = (
            jnp.argmin(tm, axis=0).astype(jnp.float32)[None, :]
            + float(c * cluster_k)
        )
        better = t_c < t_b
        return jnp.where(better, t_c, t_b), jnp.where(better, i_c, i_b)

    def _sweep_single(pd4, p, d):
        inv_d = _inv_dir(d)
        t_b = jnp.full((1, block), jnp.inf, jnp.float32)
        i_b = jnp.zeros((1, block), jnp.float32)
        for c in range(n_clusters):
            def go(st, c=c):
                tb, ib = st
                ab = jnp.dot(
                    _chunk_rows(c), pd4,
                    preferred_element_type=jnp.float32, precision=GEO,
                )
                tm = _t_masked_rows(ab[:, :block], ab[:, block:], cluster_k)
                return _fold_chunk(tm, c, tb, ib)

            if c == 0:
                # The hot segment (the scene's largest triangles,
                # _morton_order) sweeps unconditionally: it is entered
                # by ~every block, and dropping its cond + slab test
                # removes per-visit machinery from the critical path.
                t_b, i_b = go((t_b, i_b))
            else:
                t_b, i_b = jax.lax.cond(
                    jnp.max(_slab_rows(c, p, inv_d)) > 0.0,
                    go, lambda st: st, (t_b, i_b),
                )
        return _resolve(t_b, i_b, p, d)

    # The clustered pair intersect has two shapes, cfg.pair_sweep =
    # union|split (hardware-tuning gate; both bit-identical to the dense
    # sweep):
    #   * "union" (default): one fused sweep over (4, 3B) rhs columns
    #     sharing the origin projection; a cluster is entered when
    #     EITHER ray's block hits its AABB (union skip mask) and both
    #     rays' edge tests share the projected-origin rows `a`.
    #   * "split": TWO independent single sweeps with per-ray skip
    #     masks.  Hypothesis was that the rays' opposite coherence
    #     (shadow rays aim at emitters, next rays follow the sampled
    #     hemisphere) makes the union mask fire nearly every cluster;
    #     measured back-to-back on v5e (Cornell+sphere 512x512/64spp)
    #     it LOSES — 15.7M vs union's 18.9M rays/s: the per-ray masks
    #     don't skip enough extra clusters to pay for doubling the
    #     slab tests + lax.conds and recomputing `a` per ray.  Kept as
    #     a measurement gate, not a shipped path.

    def _sweep_pair(pdd, p, d1, d2):
        inv1, inv2 = _inv_dir(d1), _inv_dir(d2)
        inf_row = jnp.full((1, block), jnp.inf, jnp.float32)
        zero_row = jnp.zeros((1, block), jnp.float32)
        st = (inf_row, zero_row, inf_row, zero_row)
        for c in range(n_clusters):
            def go(s, c=c):
                t1b, i1b, t2b, i2b = s
                ab = jnp.dot(
                    _chunk_rows(c), pdd,
                    preferred_element_type=jnp.float32, precision=GEO,
                )
                a = ab[:, :block]
                tm1 = _t_masked_rows(a, ab[:, block : 2 * block], cluster_k)
                tm2 = _t_masked_rows(a, ab[:, 2 * block :], cluster_k)
                t1b, i1b = _fold_chunk(tm1, c, t1b, i1b)
                t2b, i2b = _fold_chunk(tm2, c, t2b, i2b)
                return (t1b, i1b, t2b, i2b)

            if c == 0:
                st = go(st)  # hot segment: unconditional (see above)
            else:
                any_hit = (
                    jnp.max(_slab_rows(c, p, inv1))
                    + jnp.max(_slab_rows(c, p, inv2))
                ) > 0.0
                st = jax.lax.cond(any_hit, go, lambda s: s, st)
        t1b, i1b, t2b, i2b = st
        t1, hit1, idx1_f, _p1 = _resolve(t1b, i1b, p, d1)
        nxt = _resolve(t2b, i2b, p, d2)
        return (t1, hit1, idx1_f), nxt

    def intersect(p, d):
        """-> (t_best (1,B), hit (1,B) f32 0/1, idx_f (1,B) f32 hit
               index masked to 0 on miss, point (3,B)).

        One packed matmul: rows [j*Tp:(j+1)*Tp] of pmat are plane j
        (j=0 the face plane, j=1..3 the edge planes), rhs columns
        [:B] homogeneous origins, [B:] homogeneous directions.  Large
        scenes run the cluster-chunked sweep instead (see above)."""
        p4 = jnp.concatenate([p, ones_row], axis=0)  # (4, B)
        d4 = jnp.concatenate([d, zeros_row], axis=0)
        pd4 = jnp.concatenate([p4, d4], axis=1)  # (4, 2B)
        if cluster_k:
            return _sweep_single(pd4, p, d)
        ab = jnp.dot(pmat, pd4, preferred_element_type=jnp.float32, precision=GEO)  # (4Tp, 2B)
        return _finish(ab[:, :block], ab[:, block:], p, d)

    def intersect_pair(p, d1, d2):
        """Shared-origin double intersect: the NEE shadow ray and the
        NEXT bounce's primary ray both start at the current hit point,
        so one (4Tp, 4) x (4, 3B) matmul projects the origin once and
        both directions together — 3B rhs columns per bounce instead of
        the 4B of two separate intersects.

        Returns (shadow := (t, hit, idx_f), next := full intersect
        tuple)."""
        p4 = jnp.concatenate([p, ones_row], axis=0)  # (4, B)
        d14 = jnp.concatenate([d1, zeros_row], axis=0)
        d24 = jnp.concatenate([d2, zeros_row], axis=0)
        if cluster_k:
            if pair_split:
                # Two independent sweeps with per-ray skip masks (see
                # the pair_sweep note above `_sweep_pair` — measured
                # slower at cluster_k=128; measurement gate only).
                t1, hit1, idx1_f, _p1 = _sweep_single(
                    jnp.concatenate([p4, d14], axis=1), p, d1
                )
                nxt = _sweep_single(jnp.concatenate([p4, d24], axis=1), p, d2)
                return (t1, hit1, idx1_f), nxt
            return _sweep_pair(
                jnp.concatenate([p4, d14, d24], axis=1), p, d1, d2
            )
        pdd = jnp.concatenate([p4, d14, d24], axis=1)  # (4, 3B)
        ab = jnp.dot(pmat, pdd, preferred_element_type=jnp.float32, precision=GEO)
        a = ab[:, :block]
        t1, hit1, idx1_f, _p1 = _finish(a, ab[:, block : 2 * block], p, d1)
        nxt = _finish(a, ab[:, 2 * block :], p, d2)
        return (t1, hit1, idx1_f), nxt

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

    def cross3(a, b):
        return jnp.concatenate(
            [
                a[1:2] * b[2:3] - a[2:3] * b[1:2],
                a[2:3] * b[0:1] - a[0:1] * b[2:3],
                a[0:1] * b[1:2] - a[1:2] * b[0:1],
            ],
            axis=0,
        )

    def smooth_at(point, v9, n9, area):
        """Barycentric-interpolated shading normal at `point` (reference
        Triangle::getNormal scene_basics.h:100-109; matches the XLA
        ops/intersect.py smooth_normal).  v9/n9 are (9, B) packed
        vertices / vertex normals, area (1, B); padded or miss lanes
        (all zeros) yield a zero normal, which every consumer masks."""
        a_safe = jnp.where(area > 0, area, 1.0)
        acc = jnp.zeros_like(point)
        vs = (v9[0:3], v9[3:6], v9[6:9])
        ns = (n9[0:3], n9[3:6], n9[6:9])
        for i in range(3):
            c = cross3(vs[(i + 1) % 3] - point, vs[(i + 2) % 3] - point)
            w = 0.5 * jnp.sqrt(jnp.sum(c * c, axis=0, keepdims=True)) / a_safe
            acc = acc + w * ns[i]
        return normalize3(acc)

    return _Geom(
        intersect=intersect,
        intersect_pair=intersect_pair,
        normalize3=normalize3,
        dot3=dot3,
        spec_coeff=spec_coeff,
        rotate_z_to=rotate_z_to,
        smooth_at=smooth_at,
        iota_t=iota_t,
        iota_tf=iota_tf,
        ones_row=ones_row,
        zeros_row=zeros_row,
    )


def _make_bounce(cfg_static, tp, n_emissive, no_spec, pmat, table, etab, cdf,
                 block, cab=None, cluster_k=0):
    """Build the shared per-bounce forward step.

    Returns bounce(b, u, st) -> (new_st, _BounceOut) with the lane state
    st = (d, hit, idx_f, point, l_e, l_d, prev_mult, alive): the CURRENT
    ray's pending intersection travels in (hit, idx_f, point) — each
    bounce CONSUMES it and PRODUCES the next one fused with its NEE
    shadow ray (intersect_pair: both start at the hit point), saving a
    quarter of the per-bounce intersect matmul columns.  The one-hot
    triangle selection is rebuilt from idx_f (2 ops/pair), so the state
    is exactly the rows the staged wavefront carries through HBM
    between stages (CARRY_ROWS layout).  Replicates the reference
    radiance step path_trace.cu:111-144 plus the loop body :175-181
    (quirks documented in render/forward.py).

    no_spec (static, from scene.specular_idx.shape): every Ks is zero,
    so the Phong terms contribute exactly nothing — drop the pow()
    transcendentals and specular-lobe sampling branches entirely
    (~25% of the bounce loop on v5e).

    Smooth shading: scenes with vertex normals carry 19 extra table rows
    (verts 13:22, vertex normals 22:31, area 31:32; emissive table rows
    17:26 vn, 26:27 area), detected statically from the table shape.
    The shading normal is then barycentric-interpolated at each hit
    (Triangle::getNormal), while direction sampling still rotates around
    the FACE normal (path_trace.cu:134 uses tri->normal)."""
    (max_bounces, p_rr, min_dot, epsilon, quirks, pair_split,
     fast_recip) = cfg_static
    has_vn = table.shape[0] > 16  # static: 35 rows iff vertex normals
    geom = _make_geom(tp, pmat, block, min_dot, epsilon, cab=cab,
                      cluster_k=cluster_k, pair_split=pair_split,
                      fast_recip=fast_recip)
    intersect = geom.intersect
    intersect_pair = geom.intersect_pair
    normalize3 = geom.normalize3
    dot3 = geom.dot3
    spec_coeff = geom.spec_coeff
    rotate_z_to = geom.rotate_z_to
    smooth_at = geom.smooth_at
    iota_tf = geom.iota_tf

    def init_state(p, d, alive):
        """Initial lane state: the bounce-0 intersect runs once here;
        every later intersect rides the fused shadow/next matmul."""
        zero3 = jnp.zeros((3, block), dtype=jnp.float32)
        _t, hit, idx_f, point = intersect(p, d)
        return (d, hit, idx_f, point, zero3, zero3, zero3 + 1.0, alive)

    def bounce(b, u, st):
        (d, hit, idx_f, point, l_e, l_d, prev_mult, alive) = st
        act = alive  # (1, B) f32 0/1
        hit_act = act * hit
        # One-hot selection of the pending hit (lowest-index tie already
        # resolved by _finish's argmin).
        sel = ((iota_tf == idx_f) & (hit > 0)).astype(jnp.float32)  # (Tp,B)

        # GEO (one bf16 pass) is exact for every consumer: the one-hot
        # column is exact, geometry rows are self-consistent fixed
        # perturbations, and the learnable Kd is reconstructed exactly
        # from its hi (rows 10:13) + lo (last 3 rows) bf16 split.
        hv = jnp.dot(table, sel, preferred_element_type=jnp.float32, precision=GEO)  # (16|35, B)
        emission = hv[0:3]
        mat_spec = hv[3:6]
        mat_shin = hv[6:7]
        face_n = hv[7:10]
        kd = hv[10:13] + hv[-3:]
        if has_vn:
            shade_n = smooth_at(point, hv[13:22], hv[22:31], hv[31:32])
        else:
            shade_n = face_n  # flat meshes: getNormal == face normal

        first = (b == 0).astype(jnp.float32)
        if quirks:
            l_e = jnp.where((hit_act * first) > 0, emission, l_e)
            l_e_contrib = l_e
        else:
            l_e = jnp.where((hit_act * first) > 0, emission, 0.0)
            l_e_contrib = l_e

        # --- RR + next direction (path_trace.cu:130-140) ---
        # Sampled before the NEE visibility test so the shadow ray and
        # the next bounce's primary ray (both originating at `point`)
        # share one intersect_pair matmul.  Uniform CONSUMPTION order is
        # unchanged: all 8 rows of this bounce are drawn as one batch.
        cont = hit_act * (u[3:4] < p_rr).astype(jnp.float32)
        phi = 2.0 * PI * u[4:5]
        if no_spec:
            # Diffuse-only: cosine sampling, pdf = 1/pi (quirk Q3).
            cos_t = jnp.sqrt(u[5:6])
        else:
            is_spec = (
                jnp.max(
                    (mat_spec != 0.0).astype(jnp.float32), axis=0, keepdims=True
                )
                * (mat_shin != 0.0).astype(jnp.float32)
            )
            exponent = jnp.where(is_spec > 0, 1.0 / (mat_shin + 1.0), 0.5)
            cos_t = u[5:6] ** exponent
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        hemi = jnp.concatenate(
            [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=0
        )
        next_dir = normalize3(rotate_z_to(face_n, hemi))
        cosine = dot3(next_dir, shade_n)

        # --- NEE (path_trace.cu:30-89) + fused next intersect ---
        if n_emissive > 0:
            u_pick = u[0:1]
            m = (cdf >= u_pick).astype(jnp.float32)  # (nE, B)
            eidx = jnp.argmax(m, axis=0).astype(jnp.int32)[None, :]
            iota_e = jax.lax.broadcasted_iota(jnp.int32, (n_emissive, block), 0)
            # rows where nothing matched (u > cdf max) clamp to last.
            any_m = jnp.max(m, axis=0, keepdims=True) > 0
            eidx = jnp.where(any_m, eidx, n_emissive - 1)
            e_onehot = (iota_e == eidx).astype(jnp.float32)
            # etab is material-independent (emissive geometry): GEO.
            row = jnp.dot(etab, e_onehot, preferred_element_type=jnp.float32, precision=GEO)
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
            (st_best, s_hit, s_idx_f), isect_next = intersect_pair(
                point, to_light, next_dir
            )
            ok = ok * s_hit
            if has_vn:
                # Smooth normal of the chosen light at the shadow hit
                # (path_trace.cu:61 uses t_emm->getNormal(i.hit)).
                s_point = point + to_light * jnp.where(s_hit > 0, st_best, 0.0)
                light_n = smooth_at(s_point, row[0:9], row[17:26], row[26:27])
            else:
                light_n = row[12:15]
            cos_theta_p = -dot3(light_n, to_light)
            ok = ok * (cos_theta_p >= 0.0).astype(jnp.float32)
            ok = ok * (s_idx_f == row[15:16]).astype(jnp.float32)
            geo = (
                cos_theta
                * cos_theta_p
                / jnp.where(ok > 0, st_best, 1.0) ** 2
                / row[16:17]
            )
            if no_spec:
                bsdf_direct = kd  # Ks == 0 everywhere: Phong term vanishes
            else:
                sc = spec_coeff(mat_shin, shade_n, d, to_light)
                bsdf_direct = kd + mat_spec * sc
            nee_term = jnp.where(ok > 0, row[9:12] * geo, 0.0)
            l_d_fresh = jnp.where(ok > 0, bsdf_direct * (row[9:12] * geo), 0.0)
            shadow_inc = hit_act
        else:
            isect_next = intersect(point, next_dir)
            nee_term = jnp.zeros_like(l_d)
            l_d_fresh = jnp.zeros_like(l_d)
            shadow_inc = jnp.zeros_like(act)

        l_d = jnp.where(hit_act > 0, l_d_fresh, l_d)
        if quirks:
            contrib_mask = act
            l_d_contrib = l_d
        else:
            contrib_mask = hit_act
            l_d_contrib = jnp.where(hit_act > 0, l_d_fresh, 0.0)
        c = jnp.where(contrib_mask > 0, l_e_contrib + l_d_contrib, 0.0)

        if no_spec:
            bsdf = kd / PI
            coeff = cosine * PI / p_rr  # cosine / pdf(=1/pi) / p_RR
        else:
            pdf = jnp.where(
                is_spec > 0, ((mat_shin + 1.0) * cos_t) ** mat_shin, 1.0 / PI
            )
            sc2 = spec_coeff(mat_shin, shade_n, d, next_dir)
            bsdf = kd / PI + mat_spec * sc2
            coeff = jnp.where(
                pdf > 0, cosine / jnp.where(pdf > 0, pdf, 1.0) / p_rr, 0.0
            )
        coeff = jnp.where(cont > 0, coeff, 0.0)
        f = bsdf * coeff

        tri_f = idx_f  # argmin index, masked to 0 on miss
        out = _BounceOut(
            contrib=jnp.where(contrib_mask > 0, prev_mult * c, 0.0),
            f=f,
            c=c,
            nee=nee_term,
            pm_in=prev_mult,
            coeff=coeff,
            tri_f=tri_f,
            hit=hit_act,
            esc=act * (1.0 - hit),
            seg=act,
            shadow=shadow_inc,
        )
        _tn, hit_n, idx_n, point_n = isect_next
        # Dead lanes carry the (masked-everywhere) junk next intersect
        # instead of re-intersecting a stale ray: every consumer gates
        # on `alive`, so the values never surface.
        new_st = (
            jnp.where(cont > 0, next_dir, d),
            hit_n,
            idx_n,
            point_n,
            l_e,
            l_d,
            jnp.where(cont > 0, prev_mult * f, prev_mult),
            cont,
        )
        return new_st, out

    return bounce, init_state


# ---------------------------------------------------------------------------
# RNG
# ---------------------------------------------------------------------------

_GOLDEN = -1640531527  # 0x9E3779B9 as int32


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer (full 32-bit avalanche), int32 wrapping math."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)  # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477387)  # 0xC2B2AE35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _unit_from_bits_i32(bits: jnp.ndarray) -> jnp.ndarray:
    """int32 random bits -> float32 uniforms in [0, 1) (23-bit mantissa:
    set exponent to 0x3f8 for [1, 2), subtract 1)."""
    u = jax.lax.shift_right_logical(bits, 9) | jnp.int32(0x3F800000)
    return jax.lax.bitcast_convert_type(u, jnp.float32) - 1.0


def _make_uniform_stream(fused_rng, u_or_key_ref, orig_ref, block):
    """Per-bounce (8, B) uniform source, draw(b_global, b_local).

    External mode slices the precomputed threefry rows at the LOCAL
    bounce offset (the caller passes only this kernel's rows).  Fused
    mode hashes (key0, key1, global sample index, global bounce, slot)
    with a double murmur3-fmix32 — a pure counter construction, so the
    stream is independent of tiling/sharding/compaction and the
    backward replay reproduces it exactly."""
    if fused_rng:
        k0 = u_or_key_ref[0]
        k1 = u_or_key_ref[1]
        orig = jnp.broadcast_to(orig_ref[:], (8, block))  # (8, B) i32
        slot = jax.lax.broadcasted_iota(jnp.int32, (8, block), 0)
        # Avalanche the sample index BEFORE the counter is added: with
        # the (orig ^ k0) + ctr*GOLDEN pre-hash, any two samples whose
        # masked indices differ by d*GOLDEN had fully slot-shift-
        # correlated streams (input collision ahead of both mixes).
        # Hashing orig first makes such collisions require
        # fmix32(orig2^k0) == fmix32(orig1^k0) + d*GOLDEN, which no
        # index relation induces.  Loop-invariant, so hoisted out of
        # the bounce loop.
        h_orig = _fmix32(orig ^ k0)

        def draw(b_global, b_local):
            ctr = b_global * 8 + slot
            x = _fmix32((h_orig + ctr * jnp.int32(_GOLDEN)) ^ k1)
            return _unit_from_bits_i32(x)

        return draw
    return lambda b_global, b_local: u_or_key_ref[pl.ds(b_local * 8, 8), :]


# ---------------------------------------------------------------------------
# Mega kernels (whole bounce loop per ray block)
# ---------------------------------------------------------------------------


def _kernel_fwd(
    cfg_static,
    tp,
    n_emissive,
    fused_rng,
    no_spec,
    cluster_k,
    # refs:
    p_ref,  # (3, BLOCK) ray origins
    d_ref,  # (3, BLOCK) ray dirs
    alive_ref,  # (1, BLOCK) f32 initial alive mask
    orig_ref,  # (1, BLOCK) i32 global sample indices (fused RNG)
    u_ref,  # (bounces*8, BLOCK) uniforms, or (2,) SMEM key words if fused
    pmat_ref,  # (4*Tp, 4) packed plane rows
    cab_ref,  # (8, C) cluster AABBs ((8, 1) dummy when cluster_k == 0)
    table_ref,  # (16|35, Tp): emission/spec/shin/face_n/kd_hi (+vn) + kd_lo rows
    etab_ref,  # (17|27, nE): verts emission face_n idx p (+vn area)
    cdf_ref,  # (nE, 1)
    rad_ref,  # out (3, BLOCK)
    stats_ref,  # out (2, BLOCK): per-lane segment/shadow counts
    rec_ref=None,  # optional out (bounces*REC_ROWS, BLOCK): HBM records
):
    block = p_ref.shape[1]
    bounce, init_state = _make_bounce(
        cfg_static, tp, n_emissive, no_spec,
        pmat_ref[:], table_ref[:], etab_ref[:], cdf_ref[:], block,
        cab=cab_ref[:], cluster_k=cluster_k,
    )
    max_bounces = cfg_static[0]
    draw = _make_uniform_stream(fused_rng, u_ref, orig_ref, block)

    def body(b, state):
        st, radiance, segs, shadows = state
        u = draw(b, b)  # (8, B)
        st, out = bounce(b, u, st)
        if rec_ref is not None:
            # Records variant (render_tile_pallas_rec): stream the
            # per-bounce suffix-recursion inputs to HBM so the backward
            # pass (_kernel_reverse) never replays the bounce loop.
            rec = jnp.concatenate(
                [out.f, out.c, out.nee, out.pm_in, out.coeff, out.tri_f,
                 out.hit, out.esc],
                axis=0,
            )
            rec_ref[pl.ds(b * REC_ROWS, REC_ROWS), :] = rec
        return (
            st,
            radiance + out.contrib,
            segs + out.seg,
            shadows + out.shadow,
        )

    zero3 = jnp.zeros((3, block), dtype=jnp.float32)
    zero1 = jnp.zeros((1, block), dtype=jnp.float32)
    st0 = init_state(p_ref[:], d_ref[:], alive_ref[:])
    state = jax.lax.fori_loop(
        0, max_bounces, body, (st0, zero3, zero1, zero1)
    )
    (_, radiance, segs, shadows) = state
    rad_ref[:] = radiance
    stats_ref[:] = jnp.concatenate([segs, shadows], axis=0)


def _kernel_bwd(
    cfg_static,
    tp,
    n_emissive,
    fused_rng,
    no_spec,
    cluster_k,
    # refs:
    p_ref,
    d_ref,
    alive_ref,
    g_ref,  # (3, BLOCK) per-lane radiance cotangent
    orig_ref,  # (1, BLOCK) i32
    u_ref,  # uniforms or (2,) SMEM key words if fused
    pmat_ref,
    cab_ref,
    table_ref,
    etab_ref,
    cdf_ref,
    dmats_ref,  # out (3, Tp) material cotangent, accumulated across grid
    rec_ref,  # scratch (bounces*REC_ROWS, BLOCK)
):
    block = p_ref.shape[1]
    bounce, init_state = _make_bounce(
        cfg_static, tp, n_emissive, no_spec,
        pmat_ref[:], table_ref[:], etab_ref[:], cdf_ref[:], block,
        cab=cab_ref[:], cluster_k=cluster_k,
    )
    (max_bounces, _p_rr, _min_dot, _eps, quirks, _pair, _fr) = cfg_static
    draw = _make_uniform_stream(fused_rng, u_ref, orig_ref, block)

    # Pass 1: forward replay, records to VMEM scratch (never HBM).
    def fwd_body(b, st):
        u = draw(b, b)
        st, out = bounce(b, u, st)
        rec = jnp.concatenate(
            [out.f, out.c, out.nee, out.pm_in, out.coeff, out.tri_f,
             out.hit, out.esc],
            axis=0,
        )  # (REC_ROWS, B)
        rec_ref[pl.ds(b * REC_ROWS, REC_ROWS), :] = rec
        return st

    st0 = init_state(p_ref[:], d_ref[:], alive_ref[:])
    jax.lax.fori_loop(0, max_bounces, fwd_body, st0)

    # Pass 2: reverse suffix recursion (render/diff.py steps 2-4), all in
    # VMEM.
    zero3 = jnp.zeros((3, block), jnp.float32)
    zero1 = jnp.zeros((1, block), jnp.float32)
    dmats, _suf, _esc = _suffix_recursion(
        rec_ref, g_ref[:], max_bounces, quirks, tp, block, zero3, zero1
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        dmats_ref[:] = jnp.zeros_like(dmats_ref)

    dmats_ref[:] += dmats


def _suffix_recursion(rec_ref, g, n_slots, quirks, tp, block, suf0, esc0):
    """Reverse suffix recursion over per-bounce records (render/diff.py
    steps 2-4).  suffix_k is the value BEFORE incorporating bounce k;
    the escape flag of bounce k+1 arrives via the esc_next carry —
    (suf0, esc0) seed it, so a stage's recursion chains from the NEXT
    stage's output (zeros at the last bounce).  rec_ref may be a VMEM
    scratch (replay mode, _kernel_bwd) or a streamed HBM input
    (_kernel_reverse / the staged reverse).  Zero-filled record slots
    (bounces past max_bounces in a partial stage, or skipped all-dead
    blocks) are exact no-ops: f = c = hit = esc = 0 leaves (suf, dmats)
    unchanged and correctly zeroes esc_next for a bounce that never ran.
    Returns (dmats (3, tp), suf (3, B), esc (1, B))."""
    iota_tf = jax.lax.broadcasted_iota(jnp.int32, (tp, block), 0).astype(
        jnp.float32
    )

    def rev_body(j, st):
        suf, esc_next, dmats = st
        k = n_slots - 1 - j
        rec = rec_ref[pl.ds(k * REC_ROWS, REC_ROWS), :]
        f = rec[0:3]
        c = rec[3:6]
        nee = rec[6:9]
        pm = rec[9:12]
        coeff = rec[12:13]
        tri_f = rec[13:14]
        hit = rec[14:15]
        esc = rec[15:16]
        # Throughput cotangent -> diffuse via d f/d kd = coeff/pi.
        ct = pm * suf * (coeff / PI)
        # NEE: fresh l_d at hit lanes (d l_d/d kd = nee).
        ct = ct + jnp.where(hit > 0, g * pm * nee, 0.0)
        if quirks:
            # Stale l_d re-added on escape at k+1 uses bounce k's kd.
            ct = ct + jnp.where(esc_next > 0, g * (pm * f) * nee, 0.0)
        onehot = ((iota_tf == tri_f) & (hit > 0)).astype(jnp.float32)  # (Tp,B)
        # The cotangent contraction must not quantize the gradient: split
        # ct into a bf16-exact hi part + lo remainder and contract each
        # at one-pass precision (onehot is exact in bf16), reconstructing
        # the f32 product at 2/6 the cost of a HIGHEST dot.
        ct_hi = ct.astype(jnp.bfloat16).astype(jnp.float32)
        ct_lo = ct - ct_hi
        dims = (((1,), (1,)), ((), ()))
        dmats = dmats + jax.lax.dot_general(
            ct_hi, onehot, dims,
            preferred_element_type=jnp.float32, precision=GEO,
        ) + jax.lax.dot_general(
            ct_lo, onehot, dims,
            preferred_element_type=jnp.float32, precision=GEO,
        )  # (3, Tp)
        suf = g * c + f * suf
        return (suf, esc, dmats)

    init = (suf0, esc0, jnp.zeros((3, tp), jnp.float32))
    suf, esc, dmats = jax.lax.fori_loop(0, n_slots, rev_body, init)
    return dmats, suf, esc


def _kernel_reverse(
    max_bounces,
    quirks,
    tp,
    # refs:
    g_ref,  # (3, BLOCK) per-lane radiance cotangent
    rec_ref,  # (bounces*REC_ROWS, BLOCK) records streamed from HBM
    dmats_ref,  # out (3, Tp) material cotangent, accumulated across grid
):
    """Reverse-only backward: consumes records the PRIMAL forward kernel
    already wrote (render_tile_pallas_rec), so the bounce-loop replay of
    _kernel_bwd — a full second forward pass — disappears from the
    fwd+bwd critical path.  Used by the fused value-and-grad pipeline
    (render/forward.py loss_and_grad_range)."""
    block = g_ref.shape[1]
    zero3 = jnp.zeros((3, block), jnp.float32)
    zero1 = jnp.zeros((1, block), jnp.float32)
    dmats, _suf, _esc = _suffix_recursion(
        rec_ref, g_ref[:], max_bounces, quirks, tp, block, zero3, zero1
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        dmats_ref[:] = jnp.zeros_like(dmats_ref)

    dmats_ref[:] += dmats


# ---------------------------------------------------------------------------
# Staged-wavefront kernels
# ---------------------------------------------------------------------------


def _kernel_init(
    min_dot,
    epsilon,
    tp,
    cluster_k,
    fast_recip,
    # refs:
    p_ref,  # (3, BLOCK)
    d_ref,  # (3, BLOCK)
    alive_ref,  # (1, BLOCK) f32
    pmat_ref,  # (4*Tp, 4)
    cab_ref,  # (8, C)
    carry_ref,  # out (CARRY_ROWS, BLOCK)
):
    """Bounce-0 intersect -> initial lane carry.  This is init_state
    spilled to the CARRY_ROWS layout; no extra compute vs the mega
    kernel, whose first intersect happens in the same place."""
    block = p_ref.shape[1]
    geom = _make_geom(tp, pmat_ref[:], block, min_dot, epsilon,
                      cab=cab_ref[:], cluster_k=cluster_k,
                      fast_recip=fast_recip)
    _t, hit, idx_f, point = geom.intersect(p_ref[:], d_ref[:])
    zero3 = jnp.zeros((3, block), jnp.float32)
    zero1 = jnp.zeros((1, block), jnp.float32)
    carry_ref[:] = jnp.concatenate(
        [
            d_ref[:],          # 0:3   d
            point,             # 3:6   point
            hit,               # 6     hit
            idx_f,             # 7     idx
            zero3,             # 8:11  l_e
            zero3,             # 11:14 l_d
            zero3 + 1.0,       # 14:17 prev_mult
            alive_ref[:],      # 17    alive
            zero3,             # 18:21 radiance
            zero1,             # 21    segments
            zero1,             # 22    shadow
            zero1,             # 23    pad
        ],
        axis=0,
    )


def _kernel_stage(
    cfg_static,
    tp,
    n_emissive,
    fused_rng,
    no_spec,
    cluster_k,
    k_bounces,
    with_rec,
    fori_stage,
    # refs:
    start_ref,  # SMEM (1,) i32: this stage's first global bounce
    carry_ref,  # (CARRY_ROWS, BLOCK) lane carry in
    orig_ref,  # (1, BLOCK) i32 global sample indices
    u_ref,  # (k*8, BLOCK) stage uniforms, or (2,) SMEM key words if fused
    pmat_ref,
    cab_ref,
    table_ref,
    etab_ref,
    cdf_ref,
    carry_out_ref,  # out (CARRY_ROWS, BLOCK)
    rec_ref=None,  # optional out (k*REC_ROWS, BLOCK)
):
    """One compaction stage: up to k_bounces bounces for this ray block.

    The while_loop exits as soon as (a) the stage's bounce budget is
    spent, (b) the global bounce budget is spent (partial last stage),
    or (c) EVERY lane in this block is dead — with the host-side
    alive-first partition (render/forward.py _alive_first_order), dead
    blocks cluster at the tail of the grid and cost ~a DMA each, so the
    per-bounce SIMD width tracks the actual alive curve instead of the
    worst case.  The starting bounce arrives as a traced SMEM scalar:
    one compiled kernel serves every stage of the lax.scan."""
    block = carry_ref.shape[1]
    bounce, _init = _make_bounce(
        cfg_static, tp, n_emissive, no_spec,
        pmat_ref[:], table_ref[:], etab_ref[:], cdf_ref[:], block,
        cab=cab_ref[:], cluster_k=cluster_k,
    )
    max_bounces = cfg_static[0]
    draw = _make_uniform_stream(fused_rng, u_ref, orig_ref, block)
    start = start_ref[0]

    if rec_ref is not None:
        # Zero-fill first: slots the while_loop never reaches (all-dead
        # early exit / partial last stage) must read as exact no-ops in
        # the suffix recursion.
        rec_ref[:] = jnp.zeros_like(rec_ref)

    c = carry_ref[:]
    st0 = (c[0:3], c[6:7], c[7:8], c[3:6], c[8:11], c[11:14], c[14:17],
           c[17:18])
    rad0, seg0, shw0 = c[18:21], c[21:22], c[22:23]

    if fori_stage:
        # Static-trip stage: one cond skips the whole stage when every
        # lane is already dead (with the host-side alive-first packing,
        # dead blocks cluster at the grid tail), and bounces past the
        # GLOBAL budget run with a zeroed alive mask — exact no-ops
        # (contrib/seg/shadow/records all gate on act; the pending
        # intersect they overwrite is consumed only by masked lanes).
        # Static trips let Mosaic software-pipeline the bounce body,
        # which the per-bounce while cond prevents (measured: see
        # config.stage_loop).
        def fbody(b, state):
            st, rad, seg, shw = state
            in_budget = (start + b < max_bounces).astype(jnp.float32)
            st = st[:7] + (st[7] * in_budget,)
            u = draw(start + b, b)
            st, out = bounce(start + b, u, st)
            if rec_ref is not None:
                rec = jnp.concatenate(
                    [out.f, out.c, out.nee, out.pm_in, out.coeff,
                     out.tri_f, out.hit, out.esc],
                    axis=0,
                )
                rec_ref[pl.ds(b * REC_ROWS, REC_ROWS), :] = rec
            return (st, rad + out.contrib, seg + out.seg,
                    shw + out.shadow)

        def run(state):
            return jax.lax.fori_loop(0, k_bounces, fbody, state)

        (st, rad, seg, shw) = jax.lax.cond(
            (jnp.max(st0[7]) > 0.0) & (start < max_bounces),
            run, lambda s: s, (st0, rad0, seg0, shw0),
        )
    else:
        def cond(state):
            b, st, _rad, _seg, _shw = state
            alive = st[7]
            return (
                (b < k_bounces)
                & (start + b < max_bounces)
                & (jnp.max(alive) > 0.0)
            )

        def body(state):
            b, st, rad, seg, shw = state
            u = draw(start + b, b)
            st, out = bounce(start + b, u, st)
            if rec_ref is not None:
                rec = jnp.concatenate(
                    [out.f, out.c, out.nee, out.pm_in, out.coeff,
                     out.tri_f, out.hit, out.esc],
                    axis=0,
                )
                rec_ref[pl.ds(b * REC_ROWS, REC_ROWS), :] = rec
            return (b + 1, st, rad + out.contrib, seg + out.seg,
                    shw + out.shadow)

        (_b, st, rad, seg, shw) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), st0, rad0, seg0, shw0)
        )
    (d, hit, idx_f, point, l_e, l_d, pm, alive) = st
    carry_out_ref[:] = jnp.concatenate(
        [d, point, hit, idx_f, l_e, l_d, pm, alive, rad, seg, shw,
         jnp.zeros((1, block), jnp.float32)],
        axis=0,
    )


def _kernel_stage_reverse(
    k_bounces,
    quirks,
    tp,
    # refs:
    g_ref,  # (3, BLOCK) radiance cotangent, stage lane order
    rec_ref,  # (k*REC_ROWS, BLOCK) this stage's records
    suf_ref,  # (4, BLOCK) suffix carry in: suf 0:3, esc 3
    dmats_ref,  # out (3, Tp), accumulated across the grid
    suf_out_ref,  # out (4, BLOCK) suffix carry toward earlier bounces
):
    """Suffix recursion over ONE stage's records; the (suf, esc) rows
    chain stages together (the host re-permutes them to the previous
    stage's lane order between calls)."""
    block = g_ref.shape[1]
    s = suf_ref[:]
    dmats, suf, esc = _suffix_recursion(
        rec_ref, g_ref[:], k_bounces, quirks, tp, block, s[0:3], s[3:4]
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        dmats_ref[:] = jnp.zeros_like(dmats_ref)

    dmats_ref[:] += dmats
    suf_out_ref[:] = jnp.concatenate([suf, esc], axis=0)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _pack_tables(scene, materials, cfg=None):
    """Padded device tables shared by both kernels.

    Returns (tp, pmat (4*Tp,4), table (16|35,Tp), etab (17|27,nE),
    cdf (nE,1)).  Padded triangles have an all-zero plane row, so
    |b0| < min_dot rejects them in every intersect; padded table columns
    are zero.  Scenes with vertex normals get 19 extra table rows
    (verts 13:22, vn 22:31, area 31:32) and 10 extra emissive rows
    (vn 17:26, area 26:27) for in-kernel smooth shading.

    Learnable-material exactness at single-pass matmul cost: the MXU's
    default precision rounds lhs/rhs to bf16, which would quantize the
    Kd the gradients differentiate (see the precision-policy note at the
    top of this file).  The one-hot selection column is EXACT in bf16,
    so splitting Kd into a bf16-exact hi part (rows 10:13) plus a tiny
    lo remainder (the LAST 3 rows) and summing the two looked-up rows
    reconstructs f32 Kd exactly — two extra one-pass rows instead of
    six passes over the whole table.

    Large scenes (Tp >= CLUSTER_MIN_TP) additionally get cluster
    metadata for the chunked sweep (_make_geom): tp rounds up to a
    multiple of CLUSTER_K and `cab` carries each contiguous
    CLUSTER_K-triangle cluster's margin-padded AABB as (8, C) rows
    [lo xyz, hi xyz, pad, pad].  Also returns cluster_k (0 = dense)."""
    n_tri = scene.vertices.shape[0]
    tp = _round_up(max(n_tri, 8), 8)
    cluster_k = (cluster_k_for(n_tri, cfg) if cfg is not None
                 else (CLUSTER_K if tp >= CLUSTER_MIN_TP else 0))
    if cluster_k:
        tp = _round_up(n_tri, cluster_k)
    # Morton-order internal permutation (see kernel_perm): kernel row i
    # holds global triangle order[i]; emissive-identity comparisons use
    # internal indices, wrappers map the material-gradient /
    # transport-grid outputs back.
    perm = (kernel_perm(scene, cfg) if cfg is not None
            else (_morton_order(scene, hot=cluster_k) if cluster_k else None))
    if perm is not None:
        order = perm
        e_idx_f = jnp.argsort(perm)[scene.emissive_idx].astype(jnp.float32)
    else:
        order = slice(None)
        e_idx_f = scene.emissive_idx.astype(jnp.float32)
    vertices = scene.vertices[order]
    planes = scene.plane_mat.reshape(4, n_tri, 4).transpose(2, 1, 0)[:, order]
    pad = jnp.zeros((tp - n_tri, 4), jnp.float32)
    pmat = jnp.concatenate(
        [jnp.concatenate([planes[j], pad], axis=0) for j in range(4)], axis=0
    )  # (4*Tp, 4)
    has_vn = scene.vertex_normals.shape[1] != 0
    mats_o = materials[order]
    kd_hi = mats_o.astype(jnp.bfloat16).astype(jnp.float32)
    kd_lo = mats_o - kd_hi
    cols = [
        scene.emission[order],
        scene.specular[order],
        scene.shininess[order][:, None],
        scene.face_normal[order],
        kd_hi,
    ]
    if has_vn:
        cols += [
            vertices.reshape(n_tri, 9),
            scene.vertex_normals[order].reshape(n_tri, 9),
            scene.area[order][:, None],
        ]
    cols.append(kd_lo)  # always the last 3 rows
    table = jnp.concatenate(cols, axis=1).T  # (16|35, nT)
    table = jnp.concatenate(
        [table, jnp.zeros((table.shape[0], tp - n_tri), jnp.float32)], axis=1
    )
    ev = scene.vertices[scene.emissive_idx].reshape(-1, 9)
    ecols = [
        ev,
        scene.emission[scene.emissive_idx],
        scene.face_normal[scene.emissive_idx],
        e_idx_f[:, None],
        scene.emissive_p[:, None],
    ]
    if has_vn:
        ecols += [
            scene.vertex_normals[scene.emissive_idx].reshape(-1, 9),
            scene.area[scene.emissive_idx][:, None],
        ]
    etab = jnp.concatenate(ecols, axis=1).T  # (17|27, nE)
    cdf = scene.emissive_cdf[:, None]  # (nE, 1)
    if cluster_k:
        lo_t = vertices.min(axis=1)  # (nT, 3)
        hi_t = vertices.max(axis=1)
        # Pad rows with +inf/-inf so they never extend a cluster's box
        # (every cluster holds >= 1 real triangle by construction).
        lo_t = jnp.concatenate(
            [lo_t, jnp.full((tp - n_tri, 3), jnp.inf, jnp.float32)], axis=0
        )
        hi_t = jnp.concatenate(
            [hi_t, jnp.full((tp - n_tri, 3), -jnp.inf, jnp.float32)], axis=0
        )
        c = tp // cluster_k
        lo_c = lo_t.reshape(c, cluster_k, 3).min(axis=1).T  # (3, C)
        hi_c = hi_t.reshape(c, cluster_k, 3).max(axis=1).T
        # Small conservative margin: a grazing hit exactly on the box
        # surface must never be culled by slab-test rounding.
        m = 1e-4 * (hi_c - lo_c) + 1e-5
        cab = jnp.concatenate(
            [lo_c - m, hi_c + m, jnp.zeros((2, c), jnp.float32)], axis=0
        )  # (8, C)
    else:
        cab = jnp.zeros((8, 1), jnp.float32)
    return tp, pmat, table, etab, cdf, cab, cluster_k


def unperm_rows(d: jnp.ndarray, perm) -> jnp.ndarray:
    """Map (nT, ...) kernel-internal-order rows back to global triangle
    order (no-op when perm is None): row perm[i] <- internal row i."""
    if perm is None:
        return d
    return jnp.zeros_like(d).at[perm].set(d)


def _cfg_static(cfg):
    return (cfg.max_bounces, cfg.p_rr, cfg.min_dot, cfg.epsilon,
            cfg.reference_quirks, cfg.pair_sweep == "split",
            getattr(cfg, "fast_recip", False))


def _u_spec_and_arg(uniforms, keys, ray_spec, rows):
    """The uniforms slot: (spec, arg, fused_rng flag).  keys is a (2,)
    int32 array (the render key words) when fused; uniforms a
    (rows, tile) threefry array when external."""
    if keys is not None:
        spec = pl.BlockSpec((2,), lambda i: (0,), memory_space=pltpu.SMEM)
        return spec, keys, True
    return ray_spec(rows), uniforms, False


def _compiler_params(interpret, parallel):
    if interpret or not parallel:
        return None
    # Ray blocks are independent (per-block output slices, per-block
    # RNG streams) — let Mosaic schedule them in any order.  The
    # backward/inverse kernels accumulate across the grid and must
    # stay sequential.
    return pltpu.CompilerParams(dimension_semantics=("parallel",))


def render_tile_pallas(
    materials: jnp.ndarray,
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    uniforms: jnp.ndarray = None,  # (bounces*8, tile): 6 used + 2 pad per bounce
    block: int = 2048,
    interpret: bool = False,
    orig: jnp.ndarray = None,  # (1, tile) i32 global sample indices
    keys: jnp.ndarray = None,  # (2,) i32: fused hash-RNG mode
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one ray tile with the fused megakernel.

    Returns (radiance (3, tile), stats (2, tile) per-lane seg/shadow
    counts).  Scenes with vertex normals are smooth-shaded in-kernel
    (barycentric getNormal; see _make_bounce)."""
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, materials, cfg)
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
        _kernel_fwd, _cfg_static(cfg), tp, n_e, fused_rng,
        scene.specular_idx.shape[0] == 0, ck,
    )

    rad, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(1),
            u_spec,
            full(pmat),
            full(cab),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=[ray_spec(3), ray_spec(2)],
        out_shape=[
            jax.ShapeDtypeStruct((3, tile), jnp.float32),
            jax.ShapeDtypeStruct((2, tile), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, True),
        interpret=interpret,
    )(p, d, alive, orig, u_arg, pmat, cab, table, etab, cdf)
    return rad, stats


def grad_tile_pallas(
    materials: jnp.ndarray,
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    g: jnp.ndarray,  # (3, tile) radiance cotangent
    uniforms: jnp.ndarray = None,  # (bounces*8, tile)
    block: int = 2048,
    interpret: bool = False,
    orig: jnp.ndarray = None,  # (1, tile) i32
    keys: jnp.ndarray = None,  # (2,) i32: fused hash-RNG mode
) -> jnp.ndarray:
    """Material gradient (nT, 3) for one ray tile, fully fused: forward
    replay + records + suffix recursion all inside the kernel."""
    n_tri = scene.vertices.shape[0]
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, materials, cfg)
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
        _kernel_bwd, _cfg_static(cfg), tp, n_e, fused_rng,
        scene.specular_idx.shape[0] == 0, ck,
    )

    dmats = pl.pallas_call(
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
            (3, tp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, tp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cfg.max_bounces * REC_ROWS, block), jnp.float32)
        ],
        interpret=interpret,
    )(p, d, alive, g, orig, u_arg, pmat, cab, table, etab, cdf)
    return unperm_rows(dmats[:, :n_tri].T, kernel_perm(scene, cfg))  # (nT, 3)


def render_tile_pallas_rec(
    materials: jnp.ndarray,
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    uniforms: jnp.ndarray = None,
    block: int = 2048,
    interpret: bool = False,
    orig: jnp.ndarray = None,  # (1, tile) i32
    keys: jnp.ndarray = None,  # (2,) i32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward render that ALSO streams the per-bounce backward records
    to HBM: returns (radiance (3, tile), stats (2, tile), records
    (bounces*REC_ROWS, tile)).  Feeding the records to
    reverse_tile_pallas gives the material gradient without the full
    forward replay _kernel_bwd pays — the records are ~bounces*64 B/ray
    of HBM traffic (tens of ms per 64 MB tile at v5e bandwidth) versus
    a whole second bounce-loop pass (~0.4 s at the bench config)."""
    n_e = scene.emissive_idx.shape[0]
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, materials, cfg)
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
        _kernel_fwd, _cfg_static(cfg), tp, n_e, fused_rng,
        scene.specular_idx.shape[0] == 0, ck,
    )
    rec_rows = cfg.max_bounces * REC_ROWS

    rad, stats, rec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(1),
            u_spec,
            full(pmat),
            full(cab),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=[ray_spec(3), ray_spec(2), ray_spec(rec_rows)],
        out_shape=[
            jax.ShapeDtypeStruct((3, tile), jnp.float32),
            jax.ShapeDtypeStruct((2, tile), jnp.float32),
            jax.ShapeDtypeStruct((rec_rows, tile), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, True),
        interpret=interpret,
    )(p, d, alive, orig, u_arg, pmat, cab, table, etab, cdf)
    return rad, stats, rec


def reverse_tile_pallas(
    n_tri: int,
    cfg,
    rec: jnp.ndarray,  # (bounces*REC_ROWS, tile) from render_tile_pallas_rec
    g: jnp.ndarray,  # (3, tile) radiance cotangent
    block: int = 2048,
    interpret: bool = False,
    perm=None,  # kernel_perm(scene, cfg) when the records came from a
    # clustered (internally permuted) forward kernel
) -> jnp.ndarray:
    """Material gradient (nT, 3) from streamed records — the reverse
    suffix recursion alone, no geometry, no scene tables, no replay."""
    tile = g.shape[1]
    assert tile % block == 0, (tile, block)
    tp = _round_up(max(n_tri, 8), 8)
    rec_rows = cfg.max_bounces * REC_ROWS

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel_reverse, cfg.max_bounces, cfg.reference_quirks, tp
    )
    dmats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(rec_rows)],
        out_specs=pl.BlockSpec(
            (3, tp), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, tp), jnp.float32),
        interpret=interpret,
    )(g, rec)
    return unperm_rows(dmats[:, :n_tri].T, perm)  # (nT, 3)


def init_tile_pallas(
    materials: jnp.ndarray,
    scene,
    cfg,
    p: jnp.ndarray,  # (3, tile)
    d: jnp.ndarray,  # (3, tile)
    alive: jnp.ndarray,  # (1, tile) f32
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Staged wavefront step 0: bounce-0 intersect -> (CARRY_ROWS, tile)
    lane carry."""
    tile = p.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, _table, _etab, _cdf, cab, ck = _pack_tables(scene, materials, cfg)

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_init, cfg.min_dot, cfg.epsilon, tp, ck,
                               getattr(cfg, "fast_recip", False))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), full(pmat), full(cab)],
        out_specs=ray_spec(CARRY_ROWS),
        out_shape=jax.ShapeDtypeStruct((CARRY_ROWS, tile), jnp.float32),
        compiler_params=_compiler_params(interpret, True),
        interpret=interpret,
    )(p, d, alive, pmat, cab)


def stage_tile_pallas(
    materials: jnp.ndarray,
    scene,
    cfg,
    carry: jnp.ndarray,  # (CARRY_ROWS, tile), alive-first partitioned
    orig: jnp.ndarray,  # (1, tile) i32 global sample indices
    start_bounce: jnp.ndarray,  # () or (1,) i32, traced
    k_bounces: int,
    uniforms: jnp.ndarray = None,  # (k*8, tile) this stage's rows
    block: int = 2048,
    interpret: bool = False,
    keys: jnp.ndarray = None,  # (2,) i32: fused hash-RNG mode
    with_rec: bool = False,
):
    """Run one compaction stage (<= k_bounces bounces) over the tile.

    Returns carry_out (CARRY_ROWS, tile), or (carry_out, records
    (k*REC_ROWS, tile)) when with_rec."""
    n_e = scene.emissive_idx.shape[0]
    tile = carry.shape[1]
    assert tile % block == 0, (tile, block)
    tp, pmat, table, etab, cdf, cab, ck = _pack_tables(scene, materials, cfg)
    start = jnp.asarray(start_bounce, jnp.int32).reshape((1,))

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    u_spec, u_arg, fused_rng = _u_spec_and_arg(
        uniforms, keys, ray_spec, k_bounces * 8
    )

    kernel = functools.partial(
        _kernel_stage, _cfg_static(cfg), tp, n_e, fused_rng,
        scene.specular_idx.shape[0] == 0, ck, k_bounces, with_rec,
        getattr(cfg, "stage_loop", "fori") == "fori",
    )
    out_specs = [ray_spec(CARRY_ROWS)]
    out_shape = [jax.ShapeDtypeStruct((CARRY_ROWS, tile), jnp.float32)]
    if with_rec:
        out_specs.append(ray_spec(k_bounces * REC_ROWS))
        out_shape.append(
            jax.ShapeDtypeStruct((k_bounces * REC_ROWS, tile), jnp.float32)
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem1,
            ray_spec(CARRY_ROWS),
            ray_spec(1),
            u_spec,
            full(pmat),
            full(cab),
            full(table),
            full(etab),
            full(cdf),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(interpret, True),
        interpret=interpret,
    )(start, carry, orig, u_arg, pmat, cab, table, etab, cdf)
    return (out[0], out[1]) if with_rec else out[0]


def stage_reverse_tile_pallas(
    n_tri: int,
    cfg,
    k_bounces: int,
    rec: jnp.ndarray,  # (k*REC_ROWS, tile), stage lane order
    g: jnp.ndarray,  # (3, tile) radiance cotangent, stage lane order
    suf: jnp.ndarray,  # (4, tile) suffix carry from the later stage
    block: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Suffix recursion over one stage's records.  Returns
    (dmats (nT, 3) partial material cotangent in the forward kernel's
    INTERNAL row order — the caller un-permutes the per-tile sum once
    via unperm_rows — and suf_out (4, tile))."""
    tile = g.shape[1]
    assert tile % block == 0, (tile, block)
    tp = _round_up(max(n_tri, 8), 8)

    grid = (tile // block,)
    ray_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _kernel_stage_reverse, k_bounces, cfg.reference_quirks, tp
    )
    dmats, suf_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(k_bounces * REC_ROWS), ray_spec(4)],
        out_specs=[
            pl.BlockSpec((3, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ray_spec(4),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, tp), jnp.float32),
            jax.ShapeDtypeStruct((4, tile), jnp.float32),
        ],
        interpret=interpret,
    )(g, rec, suf)
    return dmats[:, :n_tri].T, suf_out
