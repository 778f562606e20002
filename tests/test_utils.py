"""Checkpoint + metrics utilities."""

import json
import os

import numpy as np
import jax.numpy as jnp

from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from inverse_path_tracer_tpu.utils.metrics import MetricsLogger, psnr


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, tree, step=42, note="x")
    restored, step = load_checkpoint(path, tree)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.ones(4))


def test_checkpoint_atomic_overwrite(tmp_path):
    tree = {"a": jnp.zeros(3)}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, tree, step=1)
    save_checkpoint(path, {"a": jnp.ones(3)}, step=2)
    restored, step = load_checkpoint(path, tree)
    assert step == 2
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.ones(3))
    assert not os.path.exists(path + ".tmp")


def test_metrics_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path, stream=None)
    logger.log(step=1, loss=0.5)
    logger.log(step=2, loss=0.25, extra="y")
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[1]["extra"] == "y"
    assert "t" in lines[0]


def test_psnr():
    a = np.zeros((4, 4, 3))
    b = np.ones((4, 4, 3)) * 0.1
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_recover_single_chip(cornell_scene):
    """Direct recovery moves Kd toward the labels on a tiny config."""
    import jax
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=24, height=24, spp=4, max_bounces=4, tile_size=768)
    target = render_image(
        cornell_scene.diffuse, cornell_scene, jax.random.PRNGKey(0), cfg
    )
    mats, losses = recover_materials(
        cornell_scene, target, cfg, steps=30, lr=0.1, key=jax.random.PRNGKey(1)
    )
    # The resampled-key loss is bounded below by the 4spp MC noise floor;
    # a ~30% drop in 30 steps plus the Kd-error check below is the signal.
    assert losses[-1] < losses[0] * 0.75
    err0 = np.abs(0.5 - np.asarray(cornell_scene.diffuse)).mean()  # sigmoid(0)=.5 start
    err = np.abs(np.asarray(mats) - np.asarray(cornell_scene.diffuse)).mean()
    assert err < err0 * 0.7
