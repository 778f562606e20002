"""End-to-end workflow tests: CLI evaluate (the reference main()'s eval
tail), batched recovery, multihost init, profiling utilities."""

import json
import os
import zipfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest


CFG_ARGS = ["--width", "24", "--height", "24", "--spp", "4", "--bounces", "4",
            "--tile", "576"]


def test_cli_full_pipeline(tmp_path, monkeypatch):
    """generate -> extract-graph -> train-gcn -> evaluate, all via the
    CLI (the complete reference workflow ipt.py:86-140)."""
    from inverse_path_tracer_tpu import cli

    monkeypatch.chdir(tmp_path)
    cli.main(["generate", "2", "--scenes-dir", "scenes", "--imgs-dir", "imgs",
              *CFG_ARGS])
    assert os.path.exists("scenes/1.txt") and os.path.exists("imgs/1.png")

    for i in range(2):
        cli.main(["extract-graph", f"scenes/{i}.txt", f"imgs/{i}.png",
                  f"graph_{i}.npz", *CFG_ARGS])
    with np.load("graph_0.npz") as d:
        assert d["w"].shape == (31, 30)

    cli.main(["train-gcn", "graph_0.npz", "graph_1.npz", "--out", "gcn.npz",
              "--epochs", "300", "--lr", "1e-3", "--log", "gcn.jsonl",
              "--log-every", "100"])
    assert os.path.exists("gcn.npz")
    lines = [json.loads(l) for l in open("gcn.jsonl")]
    assert lines[-1]["loss"] < lines[0]["loss"]

    cli.main(["evaluate", "gcn.npz", "graph_0.npz", "graph_1.npz",
              "--scenes-dir", "scenes", "--imgs-dir", "imgs",
              "--out-dir", "preds", *CFG_ARGS])
    assert os.path.exists("preds/0_true.png")
    assert os.path.exists("preds/1_pred.png")
    with zipfile.ZipFile("preds.zip") as zf:
        assert len(zf.namelist()) == 4


def test_recover_batched(cornell_scene):
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3, tile_size=256)
    key = jax.random.PRNGKey(0)
    targets = jnp.stack(
        [
            render_image(cornell_scene.diffuse, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.5, cornell_scene, key, cfg),
        ]
    )
    mats, losses = recover_materials_batched(
        cornell_scene, targets, cfg, steps=10, lr=0.1
    )
    assert mats.shape == (2, 30, 3)
    assert losses[-1] < losses[0]


def test_recover_batched_checkpoint_resume(cornell_scene, tmp_path):
    """A batched run interrupted at step 5 and resumed matches the
    uninterrupted 10-step run bit-for-bit (per-step keys are pure
    functions of (key, step))."""
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3, tile_size=256)
    key = jax.random.PRNGKey(0)
    targets = jnp.stack(
        [
            render_image(cornell_scene.diffuse, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.5, cornell_scene, key, cfg),
        ]
    )
    ckpt = str(tmp_path / "batch.npz")
    full, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=10, lr=0.1, key=key
    )
    recover_materials_batched(
        cornell_scene, targets, cfg, steps=5, lr=0.1, key=key,
        checkpoint_path=ckpt, checkpoint_every=5,
    )
    resumed, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=10, lr=0.1, key=key,
        checkpoint_path=ckpt, resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))


def test_recover_batched_scene_chunk_identical(cornell_scene):
    """scene_chunk splits each step into several device programs (the
    tunneled TPU kills programs >~60 s); scenes are independent, so the
    chunked step must be bit-identical to the single-dispatch step."""
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3, tile_size=256)
    key = jax.random.PRNGKey(0)
    targets = jnp.stack(
        [
            render_image(cornell_scene.diffuse, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.5, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.8, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.2, cornell_scene, key, cfg),
        ]
    )
    whole, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=4, lr=0.1, key=key
    )
    chunked, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=4, lr=0.1, key=key, scene_chunk=2
    )
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


def test_recover_batched_resume_inside_avg_window(cornell_scene, tmp_path):
    """Resuming INSIDE the final-K Polyak-averaging window is
    bit-identical to the uninterrupted run: the accumulator is
    checkpointed alongside (thetas, states) (advisor r4 finding)."""
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3, tile_size=256)
    key = jax.random.PRNGKey(0)
    targets = jnp.stack(
        [render_image(cornell_scene.diffuse, cornell_scene, key, cfg)]
    )
    ckpt = str(tmp_path / "avg.npz")
    full, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=10, lr=0.1, key=key,
        average_last=6,
    )
    # Simulate the 10-step run killed right after step 8's checkpoint:
    # by then the window (which starts at step 4) holds steps 4..7, so
    # the stand-in short run uses average_last=4 to accumulate exactly
    # that prefix before saving.
    recover_materials_batched(
        cornell_scene, targets, cfg, steps=8, lr=0.1, key=key,
        average_last=4, checkpoint_path=ckpt, checkpoint_every=4,
    )
    assert os.path.exists(ckpt + ".avg")
    resumed, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=10, lr=0.1, key=key,
        average_last=6, checkpoint_path=ckpt, resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))


def test_recover_batched_sharded_matches_single(cornell_scene):
    """The mesh-sharded batched step computes the same recovery as the
    single-chip batched step (psum'd grads == full-batch grads)."""
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.parallel.shard import make_mesh
    from inverse_path_tracer_tpu.render.forward import render_image

    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=3, tile_size=128)
    key = jax.random.PRNGKey(0)
    targets = jnp.stack(
        [
            render_image(cornell_scene.diffuse, cornell_scene, key, cfg),
            render_image(cornell_scene.diffuse * 0.5, cornell_scene, key, cfg),
        ]
    )
    single, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=3, lr=0.1, key=key
    )
    sharded, _ = recover_materials_batched(
        cornell_scene, targets, cfg, steps=3, lr=0.1, key=key,
        mesh=make_mesh(),
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=2e-6
    )


def test_multihost_single_process():
    from inverse_path_tracer_tpu.parallel.multihost import init_distributed

    info = init_distributed()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8


def test_profiling_utils(tmp_path):
    from inverse_path_tracer_tpu.utils.profiling import StageTimer, profile_trace

    t = StageTimer()
    with t.stage("a"):
        x = jnp.ones(8).sum()
    assert t.stages["a"] >= 0
    # no-op path
    with profile_trace(None):
        pass
    # real trace path writes files
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones(8).sum().block_until_ready()
    assert any((tmp_path / "trace").rglob("*"))
