"""Tone mapping (reference toneMap path_trace.cu:186-198): mean over
samples, then Reinhard 255*x/(1+x) with C-style uint8 truncation; no
gamma."""

from __future__ import annotations

import jax.numpy as jnp


def tonemap_mean(samples: jnp.ndarray, spp: int) -> jnp.ndarray:
    """(H*W*spp, 3) radiance -> (H, W, 3) float image in [0, 1).

    Sample layout matches the reference linearization
    curr = (r*W + c)*spp + s (path_trace.cu:155-156, 191-192).
    Differentiable — used as the comparison domain for gradient-based
    recovery (the uint8 quantization is applied only when writing PNGs)."""
    mean = samples.reshape(-1, spp, 3).mean(axis=1)
    return mean / (1.0 + mean)


def tonemap_to_uint8(image01: jnp.ndarray) -> jnp.ndarray:
    """[0,1) float image -> uint8 via truncation toward zero (the C cast
    in path_trace.cu:196)."""
    return (255.0 * image01).astype(jnp.uint8)
