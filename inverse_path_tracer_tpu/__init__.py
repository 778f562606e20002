"""inverse_path_tracer_tpu — a TPU-native differentiable inverse path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bblinn2017/inverse_path_tracer (CUDA/C++/torch reference):

  * forward Monte-Carlo path tracing with next-event estimation
    (reference: path_trace.cu),
  * light-transport-graph extraction (reference: inv_path_trace.cu,
    inv_scene.h),
  * GCN-based inverse material regression (reference: ipt.py),
  * and — new, enabled by the functional design — direct gradient-based
    material recovery through the differentiable renderer.

Design stance (TPU-first, not a port):
  * Scene is a pytree of flat SoA arrays; materials are a standalone
    (nT, 3) parameter array (reference bakes them into Triangle objects).
  * The per-(pixel,sample) CUDA megakernel becomes a jitted wavefront
    bounce loop over tiled ray batches; Russian roulette and hit/miss
    divergence become lane masks.
  * CUDA atomics (inv_scene.h:26-36) become segment-sum reductions.
  * Scaling is SPMD over a jax.sharding.Mesh: ray batch sharded,
    scene/materials replicated, gradients/transport grids psum-reduced.
"""

import jax as _jax

# f32 numerics are part of the behavioral contract: the reference is an
# f32 CUDA renderer, and on TPU the MXU's DEFAULT matmul precision is a
# single bf16 pass — that quantizes the learnable materials (table
# lookups are one-hot matmuls) and the plane-test geometry to ~3 decimal
# digits, visibly shifting renders (~0.8% in image loss, measured on
# v5e) and corrupting finite-difference gradient checks (the +-eps
# perturbation lands across bf16 quantization steps).  Everything this
# package traces therefore defaults to full-f32 matmuls; the hand-written
# Pallas kernels additionally pin precision=HIGHEST explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.scene.build import SceneData, load_scene, build_scene
from inverse_path_tracer_tpu.render.forward import (
    render_samples,
    render_image,
    render_to_png,
)

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "SceneData",
    "load_scene",
    "build_scene",
    "render_samples",
    "render_image",
    "render_to_png",
]
