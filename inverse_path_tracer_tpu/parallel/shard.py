"""SPMD scaling over a jax.sharding.Mesh.

The reference's entire parallelism story is a single-GPU CUDA thread grid
plus atomics (SURVEY.md §2.3).  Here the scaling axis is the ray/sample
batch: rays are sharded over a 1-D 'rays' mesh axis, scene geometry and
the (nT,3) material array are replicated, and the only cross-chip
payloads are psum'd material gradients and transport grids (both tiny,
so ICI collectives are negligible next to render compute).

Multi-host: the same SPMD program runs under jax.distributed.initialize;
jax.sharding places the 'rays' axis across all processes' devices and the
psums ride ICI within a slice / DCN across hosts.

Determinism invariant: per-sample RNG is keyed by global tile index
(render/forward.py), so the N-chip render is bit-identical to the 1-chip
render — tested in tests/test_sharding.py.  Caveat: the invariant holds
when cfg.tile_size <= the per-device sample count; a larger tile_size
shrinks the effective tile inside each shard (tile = min(tile_size,
count)) and the tile RNG keys no longer line up with the single-chip
run (still a correct render, just a different random stream).
"""

from __future__ import annotations

import functools
import warnings
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import RenderStats, render_range
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import SceneData

AXIS = "rays"


class TileRNGInvariantWarning(UserWarning):
    """cfg.tile_size exceeds the per-device sample count: the effective
    tile shrinks inside each shard, the global tile RNG keys no longer
    line up with the single-chip run, and the N-chip render — while
    still a correct, deterministic render — is NOT bit-identical to the
    1-chip render (CLAUDE.md invariant)."""


def _check_tile_invariant(cfg: RenderConfig, per_dev: int) -> None:
    if cfg.tile_size > per_dev:
        warnings.warn(
            f"tile_size={cfg.tile_size} > per-device sample count "
            f"{per_dev}: N-chip render will not be bit-identical to the "
            f"1-chip render (different tile RNG keys). Set tile_size <= "
            f"{per_dev} to restore the invariant.",
            TileRNGInvariantWarning,
            stacklevel=3,
        )


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the ray/sample axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


def _per_device_count(cfg: RenderConfig, n_dev: int) -> int:
    """Samples per device: total padded up so each device's share is a
    multiple of both the tile size and spp (whole pixels per shard)."""
    total = cfg.n_samples
    quantum = cfg.spp * n_dev
    padded = -(-total // quantum) * quantum
    per_dev = padded // n_dev
    # Keep each shard tile-aligned so global tile RNG indices line up.
    tile = min(cfg.tile_size, per_dev)
    if per_dev % tile:
        per_dev = -(-per_dev // tile) * tile
    return per_dev


def render_samples_sharded(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, RenderStats]:
    """Sharded render: (n_samples, 3) radiance gathered across the mesh.

    Equivalent to render_samples() bit-for-bit (same tile RNG), with the
    sample axis split over the 'rays' mesh axis."""
    n_dev = mesh.devices.size
    per_dev = _per_device_count(cfg, n_dev)
    _check_tile_invariant(cfg, per_dev)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(AXIS), P(), P()),
    )
    def local(mats, sc, k):
        i = jax.lax.axis_index(AXIS)
        start = (i * per_dev).astype(jnp.int32)
        vals, stats = render_range(mats, sc, k, cfg, start, per_dev)
        segs = jax.lax.psum(stats.segments, AXIS)
        shad = jax.lax.psum(stats.shadow_rays, AXIS)
        return vals, segs, shad

    vals, segs, shad = local(materials, scene, key)
    return vals[: cfg.n_samples], RenderStats(segments=segs, shadow_rays=shad)


def render_image_sharded(
    materials: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    samples, _ = render_samples_sharded(materials, scene, key, cfg, mesh)
    return tonemap_mean(samples, cfg.spp).reshape(cfg.height, cfg.width, 3)


def make_recover_step_fn(
    scene: SceneData,
    cfg: RenderConfig,
    mesh: Mesh,
    optimizer,
) -> Callable:
    """Build the jitted sharded training step for direct gradient-based
    material recovery (the TPU-idiomatic inverse path; capability
    analogue of the reference's render/compare loop ipt.py:127-140 made
    differentiable).

    Parameters are unconstrained logits theta (nT,3); Kd = sigmoid(theta)
    in [0,1] (matching the GCN's sigmoid output head, ipt.py:45).  Loss =
    mean |tonemap(render(Kd)) - target| over pixels.

    Each device renders its ray shard, computes the gradient of its
    partial loss w.r.t. the *replicated* parameters, and psums both loss
    and gradient — the all-reduce is the only collective.  Returns the
    UN-jitted step(params, opt_state, key, target) -> (params, opt_state,
    loss), composable under jit/lax.map (models/recover.py batches it
    over a scene axis); make_recover_step below is the jitted wrapper."""
    n_dev = mesh.devices.size
    per_dev = _per_device_count(cfg, n_dev)
    _check_tile_invariant(cfg, per_dev)
    pixels_per_dev = per_dev // cfg.spp
    denom = float(cfg.width * cfg.height * 3)

    def local_loss(theta, sc, k, target_flat, dev_idx):
        mats = jax.nn.sigmoid(theta)
        start = (dev_idx * per_dev).astype(jnp.int32)
        vals, _ = render_range(mats, sc, k, cfg, start, per_dev)
        local_img = tonemap_mean(vals, cfg.spp)  # (pixels_per_dev, 3)
        pix_start = (dev_idx * pixels_per_dev).astype(jnp.int32)
        tgt = jax.lax.dynamic_slice(
            target_flat, (pix_start, jnp.int32(0)), (pixels_per_dev, 3)
        )
        # Padded shards read clamped target rows; mask them out.
        pix_idx = pix_start + jnp.arange(pixels_per_dev)
        valid = (pix_idx < cfg.width * cfg.height)[:, None]
        return jnp.sum(jnp.abs(local_img - tgt) * valid) / denom

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        # check_vma=False: the analytic custom VJP's scan-transposed
        # cotangent accumulator trips the typed shard_map's varying-axis
        # check (unvarying zero init + varying per-tile cotangent) — the
        # error message itself recommends this workaround.  With
        # checking off, replicated-input cotangents are NOT auto-psum'd,
        # so the gradient all-reduce below is explicit again (verified
        # against the single-chip gradient in tests).
        check_vma=False,
    )
    def sharded_step(theta, opt_state, sc, k, target_flat):
        i = jax.lax.axis_index(AXIS)
        loss, grad = jax.value_and_grad(local_loss)(theta, sc, k, target_flat, i)
        loss = jax.lax.psum(loss, AXIS)
        grad = jax.lax.psum(grad, AXIS)
        updates, opt_state = optimizer.update(grad, opt_state, theta)
        theta = jax.tree.map(lambda p, u: p + u, theta, updates)
        return theta, opt_state, loss

    def step(theta, opt_state, key, target):
        target_flat = target.reshape(-1, 3)
        return sharded_step(theta, opt_state, scene, key, target_flat)

    return step


def make_recover_step(
    scene: SceneData,
    cfg: RenderConfig,
    mesh: Mesh,
    optimizer,
) -> Callable:
    """Jitted single-scene sharded recovery step (see make_recover_step_fn)."""
    return jax.jit(make_recover_step_fn(scene, cfg, mesh, optimizer))
