"""Static render/train configuration.

The reference hardcodes every knob as a compile-time #define
(reference scene.h:3-13: IM_WIDTH/IM_HEIGHT 500, SAMPLE_NUM 100, p_RR .9,
camera EYE/LOOK/UP/HA/AR; scene_basics.h:13-14: MIN_DOT 1e-4, EPSILON 1e-2;
inv_scene.h:5: P_SPEC 0.).  Changing the resolution requires recompiling
both .so files.  Here the same constants live in a frozen, hashable
dataclass threaded through jit as a static argument, so any resolution /
spp / bounce budget compiles on demand.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera (reference scene.h:3-7 defaults)."""

    eye: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    look: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    height_angle_deg: float = 90.0
    aspect_ratio: float = 1.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration for one render; hashable => usable as a jit
    static argument."""

    width: int = 500
    height: int = 500
    spp: int = 100
    # The reference's Russian-roulette loop is unbounded (path_trace.cu:175);
    # on TPU the bounce loop is a fixed-trip masked scan.  At p_rr=.9 the
    # survival past 32 bounces is 0.9**32 ~= 3.4% of *paths* (far less of
    # throughput-weighted radiance); raise for tighter parity.
    max_bounces: int = 16
    p_rr: float = 0.9
    # Geometry epsilons (reference scene_basics.h:13-14).
    min_dot: float = 1e-4
    epsilon: float = 1e-2
    # Specular path sampling probability for the inverse pass
    # (reference inv_scene.h:5 P_SPEC = 0.).
    p_spec: float = 0.0
    camera: CameraConfig = CameraConfig()
    # Rays are streamed through the chip in tiles of this many lanes to
    # bound live memory; the tile count is a static grid.  16384 is the
    # measured v5e sweet spot: the (tile, 4*nT) intersect intermediates
    # (~8 MB) stay resident in VMEM, so the bounce loop never round-trips
    # HBM — 98M rays/s vs 49M at 131072 (512x512/64spp sweep, 2026-08).
    tile_size: int = 1 << 14
    # Replicate reference quirks bit-for-bit (see render/forward.py
    # docstring); set False for the physically-corrected estimator.
    reference_quirks: bool = True
    # Rematerialization granularity for reverse-mode AD:
    #   "both" (default) — checkpoint render tiles AND each bounce step;
    #             backward replays bounce internals from carries.  ~3
    #             forward passes of compute but minimal residual traffic.
    #             Measured on v5e at 512x512/64spp: 18.6s fwd+bwd.
    #   "tile"  — checkpoint whole tiles only; backward stores the
    #             un-checkpointed bounce internals for one tile (~1.5 GB
    #             at the default tile).  Measured SLOWER (22-25s) — the
    #             residual HBM traffic costs more than the recompute —
    #             and far slower to compile; kept for small configs and
    #             ablation.
    remat: str = "both"
    # Compute backend for the render / inverse bounce loops:
    #   "auto"   — the fused Pallas megakernels on a real TPU (flat-
    #              shaded scenes), the XLA wavefront scan otherwise
    #              (default).
    #   "xla"    — force the jitted wavefront scan (differentiable,
    #              works on CPU/TPU, supports vertex-normal meshes).
    #   "pallas" — force the fused VMEM megakernels
    #              (ops/pallas/render_kernel.py, inverse_kernel.py) even
    #              off-TPU (interpreter mode — slow, used by tests);
    #              still falls back to XLA for vertex-normal meshes.
    backend: str = "auto"
    # Material-gradient strategy:
    #   "custom"  — analytic multilinear VJP.  XLA backend: per-tile
    #               records replay + suffix recursion (render/diff.py).
    #               Pallas backend: the fused backward megakernel
    #               (ops/pallas/render_kernel.py grad_tile_pallas) —
    #               records live in VMEM scratch, never HBM.
    #   "records" — (pallas backend) force the XLA records replay as the
    #               backward; oracle/ablation path.
    #   "ad"      — (xla backend) plain jax.grad through the
    #               (rematerialized) scan.
    grad_mode: str = "custom"
    # Uniform-stream source for the Pallas kernels:
    #   "auto"     — in-kernel counter-hash RNG (murmur3-fmix32 double
    #                mix over (key words, global sample index, bounce,
    #                slot)) when running on a real TPU with
    #                grad_mode="custom"; external threefry otherwise.
    #                Fused RNG removes the XLA threefry generation and
    #                the (bounces*8, tile) HBM uniforms stream; renders
    #                are deterministic in the key and bit-identical
    #                under ANY tiling / sharding / lane compaction
    #                (streams are pure functions of the global sample
    #                index), but samples differ from the XLA path.
    #   "external" — always feed the XLA threefry uniforms (required for
    #                bitwise XLA<->Pallas comparison).
    #   "fused"    — force the hash RNG anywhere, including the CPU
    #                interpreter (used by tests to FD-check fused-mode
    #                gradients off-hardware).
    rng: str = "auto"
    # Pallas bounce-loop organisation.  Both are production paths; the
    # measured v5e policy (512x512/64spp/16b) is scene-size dependent and
    # "auto" picks by the same padded-triangle-count threshold as the
    # cluster-chunked sweep (render/forward.py _use_staged):
    #   "mega"   — the whole bounce loop in ONE kernel per ray block;
    #              zero orchestration overhead, maximal dead work.  WINS
    #              on small scenes (301.8M rays/s on the 30-tri Cornell
    #              vs staged's 54.6M: per-bounce work is so cheap that
    #              the host-side lane re-permutation between stages
    #              costs more than the dead-lane slots it skips).
    #   "staged" — staged compaction wavefront: the bounce loop runs in
    #              stages of `stage_bounces`; between stages the lane
    #              carry is stable-partitioned (alive-first + ray-binned
    #              on clustered scenes) so dead lanes cluster into
    #              trailing ray blocks whose in-kernel while_loop exits
    #              immediately.  WINS on large scenes (Cornell + 1280-tri
    #              sphere: 18.9M reproducible vs mega's compile-sensitive
    #              6.4-9.5M — per-slot cost scales with Tp, so tracking
    #              the alive curve pays and the binned blocks keep the
    #              cluster-AABB skip firing).
    #   "auto"   — staged iff the scene is clustered (the default).
    # Forcing either path is always valid (bit-parity tested); mega is
    # the oracle for staged in tests.
    wavefront: str = "auto"
    # Bounces per compaction stage (staged wavefront only): smaller
    # tracks the alive decay tighter but pays more partition/sort
    # overhead per tile.  4 is the measured v5e optimum on the vn
    # sphere (sb2 5.08s / sb4 4.49s / sb8 5.83s at 512x512/64spp): the
    # per-stage sort+permute costs ~0.15s/stage-set while stage-START
    # quantization wastes ~k/2 bounces on lanes that die mid-stage.
    stage_bounces: int = 4
    # Plane-resolution reciprocal in the Pallas sweeps (BASELINE.md
    # roofline lever #2): True (default) computes t with the hardware
    # approximate reciprocal refined by ONE Newton step instead of the
    # exact divide — measured +6.1% forward throughput on v5e (320.5M
    # vs 302M rays/s, same-process A/B; the RAW approx without Newton
    # gives +8.2% but its ~2e-3 relative error moves hit points near
    # the EPSILON=1e-2 scale and flips edge hits).  The Newton-refined
    # ~4e-6 relative t perturbation is geometry-only and far below the
    # accepted one-pass bf16 intersect quantization (~2^-8; see
    # render_kernel.py's precision policy): gradients stay exactly
    # self-consistent and the hardware golden/FD gates validate the
    # mode end-to-end.  It breaks exact XLA<->Pallas float equality, so
    # the strict oracle-parity tests pin fast_recip=False; a
    # default-mode closeness test covers this path
    # (test_default_fast_recip_close_to_xla).  Set False for the exact
    # divide.
    fast_recip: bool = True
    # Stage-kernel bounce loop shape (staged wavefront only):
    #   "fori"  — whole-stage skip via ONE cond around a static-trip
    #             fori_loop; bounces past the global budget run masked
    #             (exact no-ops).  Static trips let Mosaic pipeline the
    #             bounce body.
    #   "while" — per-bounce while_loop that also exits mid-stage when
    #             every lane dies (round-3 shipped shape).
    stage_loop: str = "fori"
    # Cluster-chunked sweep width for large scenes (triangles per
    # contiguous index-cluster in the Pallas kernels).  0 = the measured
    # default (ops/pallas/render_kernel.py CLUSTER_K, overridable via
    # IPT_CLUSTER_K for process-level sweeps).  A static dataclass field
    # so same-process A/B sweeps participate in jit cache keys — the
    # only comparison CLAUDE.md trusts on the drifting tunneled chip.
    cluster_k: int = 0
    # Pair-intersect organisation for the clustered sweep:
    #   "union" — one fused sweep over (4, 3B) rhs columns; a cluster is
    #             entered when EITHER ray's block hits its AABB.  Wins
    #             at cluster_k=128 (18.9M vs split's 15.7M on the vn
    #             scene, v5e round 3).
    #   "split" — two independent single-ray sweeps with per-ray skip
    #             masks; measurement gate.
    pair_sweep: str = "union"
    # Kernel-internal triangle ordering for clustered (large) scenes:
    #   "morton" — sort triangles by centroid Z-order so contiguous
    #              clusters are spatially compact patches (tight AABBs
    #              -> the block-wide cluster skip actually fires).
    #              Global triangle indices stay the external contract;
    #              wrappers map index-carrying outputs back.
    #   "file"   — keep file order (measurement gate / ablation).
    tri_order: str = "morton"
    # Origin-cell granularity per axis for the staged wavefront's ray
    # binning on clustered scenes (render/forward.py _binned_order):
    # lanes are grouped by direction octant and a bin_cells^3 spatial
    # grid of their origin so ray blocks stay coherent for the
    # cluster-AABB skip.
    bin_cells: int = 2
    # Ray-intersection strategy for the XLA path:
    #   "auto"/"brute" — the dense plane-matmul sweep over all triangles
    #                    (MXU-optimal at the reference's scene sizes and
    #                    well past 1k triangles; SURVEY.md §7.2).
    #   "bvh"          — stack-based BVH traversal (ops/bvh.py); for
    #                    scenes far beyond that regime.  Requires a scene
    #                    with an attached BVH (load_scene(with_bvh=True)
    #                    or ops.bvh.attach_bvh).  The Pallas kernels
    #                    ignore this knob: they run the dense packed
    #                    plane-matmul sweep on small scenes and the
    #                    cluster-chunked AABB sweep (bit-identical; see
    #                    cluster_k) on large ones.
    intersect: str = "auto"

    @property
    def n_samples(self) -> int:
        return self.width * self.height * self.spp

    def with_(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """GCN / recovery training schedule (reference ipt.py:110-111)."""

    lr: float = 1e-4
    epochs: int = 100_000
    log_every: int = 1000
    hidden: int = 100  # reference ipt.py:33
    p_min: float = 1e-3  # edge threshold, reference ipt.py:26
    seed: int = 0
    checkpoint_every: int = 0  # 0 = disabled
    checkpoint_dir: str = "checkpoints"
