"""Dataset generation pipeline (reference ipt_cuda.py:115-183).

generate_files(n): write n scene DSL files and forward-render each to a
PNG (reference :115-134).
generate_data(scenefile, imgfile): extract the transport graph of a
scene against its rendered image; returns (w, pixel, light, labels)
exactly as the reference's createGraph + getMaterials (:136-165).
render_with_materials: re-render a scene with predicted materials
(:167-183) — materials are just an array argument here, no set/get
mutation needed.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_to_png
from inverse_path_tracer_tpu.render.inverse import extract_graph
from inverse_path_tracer_tpu.scene.build import SceneData, load_scene
from inverse_path_tracer_tpu.scene.dsl import generate_scene_files, standard_scene_string


def load_image01(path: str, size=None) -> jnp.ndarray:
    """PNG -> (H, W, 3) float in [0, 1] (the reference reads the rendered
    PNG back with stbi_load and divides by 255, inv_scene.h:56, 74-77).
    `size` (w, h) optionally box-downsamples, e.g. to match a recovery
    config's resolution."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None and img.size != tuple(size):
        img = img.resize(tuple(size), Image.BOX)
    img = np.asarray(img, dtype=np.float32) / 255.0
    return jnp.asarray(img)


def generate_files(
    n: int,
    cfg: RenderConfig,
    scenes_dir: str = "scenes",
    imgs_dir: str = "imgs",
    asset_root: str = "/root/reference",
    seed: int = 0,
    key: Optional[jax.Array] = None,
) -> None:
    """Write scenes/{i}.txt and render imgs/{i}.png (ipt_cuda.py:115-134).
    Seeded and keyed for reproducibility (the reference uses an unseeded
    numpy RNG and wall-clock CUDA seeds)."""
    os.makedirs(imgs_dir, exist_ok=True)
    paths = generate_scene_files(n, out_dir=scenes_dir, seed=seed)
    key = jax.random.PRNGKey(seed) if key is None else key
    for i, path in enumerate(paths):
        scene = load_scene(path, asset_root=asset_root)
        render_to_png(
            scene.diffuse,
            scene,
            jax.random.fold_in(key, i),
            cfg,
            os.path.join(imgs_dir, f"{i}.png"),
        )


_EXTRACT_JIT = None


def _extract_graph_jit():
    """Module-cached jit of extract_graph (one trace for all scenes)."""
    global _EXTRACT_JIT
    if _EXTRACT_JIT is None:
        _EXTRACT_JIT = jax.jit(extract_graph, static_argnums=(3,))
    return _EXTRACT_JIT


def generate_data(
    scenefile: str,
    imgfile: str,
    cfg: RenderConfig,
    asset_root: str = "/root/reference",
    key: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Transport graph + labels for one scene (ipt_cuda.py:136-165):
    returns (w (nT+1,nT), pixel (nT+1,nT,3), light (nT+1,nT,3),
    labels (nT,3))."""
    scene = load_scene(scenefile, asset_root=asset_root)
    target = load_image01(imgfile)
    assert target.shape == (cfg.height, cfg.width, 3), (
        f"image {target.shape} != config {(cfg.height, cfg.width, 3)}"
    )
    key = jax.random.PRNGKey(0) if key is None else key
    w, pixel, light = _extract_graph_jit()(scene, target, key, cfg)
    pixel = np.asarray(pixel)
    assert not np.isnan(pixel).any()  # the reference's one sanity check
    return np.asarray(w), pixel, np.asarray(light), np.asarray(scene.diffuse)


def render_with_materials(
    scenefile: str,
    imgfile: str,
    materials,
    cfg: RenderConfig,
    asset_root: str = "/root/reference",
    key: Optional[jax.Array] = None,
) -> None:
    """Re-render with predicted per-triangle diffuse (ipt_cuda.py:167-183).
    The reference round-trips through setMaterials into Triangle structs;
    here materials are simply the parameter array."""
    scene = load_scene(scenefile, asset_root=asset_root)
    key = jax.random.PRNGKey(0) if key is None else key
    mats = jnp.asarray(np.asarray(materials), dtype=jnp.float32)
    render_to_png(mats, scene, key, cfg, imgfile)
