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
