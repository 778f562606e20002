"""Direct gradient-based material recovery.

The TPU-idiomatic inverse path the reference cannot express: because the
renderer is a pure differentiable function of the (nT,3) material array,
material recovery is just optimization of
    loss(theta) = mean |tonemap(render(sigmoid(theta))) - target|
(BASELINE.json configs #3-#5).  The sharded multi-chip step lives in
parallel/shard.py (make_recover_step); this module is the single-chip
convenience wrapper plus the batched multi-scene driver.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import SceneData


def recover_loss(
    theta: jnp.ndarray,
    scene: SceneData,
    key: jax.Array,
    cfg: RenderConfig,
    target01: jnp.ndarray,
) -> jnp.ndarray:
    mats = jax.nn.sigmoid(theta)
    vals, _ = render_samples(mats, scene, key, cfg)
    img = tonemap_mean(vals, cfg.spp).reshape(cfg.height, cfg.width, 3)
    return jnp.mean(jnp.abs(img - target01))


def make_single_chip_step_fn(
    scene: SceneData, cfg: RenderConfig, optimizer, n_keys: int = 1
):
    """Un-jitted recovery step, composable under jit/lax.map.

    n_keys > 1 averages the loss/gradient over that many independent
    render keys per step (an on-device lax.map, one optimizer update) —
    a k-fold cut of the Monte-Carlo gradient variance at k-fold render
    cost, for configs where the per-step MC noise floor (not the lr
    schedule) limits recovery quality."""

    def step(theta, opt_state, key, target01):
        if n_keys <= 1:
            loss, grad = jax.value_and_grad(recover_loss)(
                theta, scene, key, cfg, target01
            )
        else:
            def one(k):
                return jax.value_and_grad(recover_loss)(
                    theta, scene, k, cfg, target01
                )

            keys = jax.vmap(lambda j: jax.random.fold_in(key, j))(
                jnp.arange(n_keys)
            )
            losses, grads = jax.lax.map(one, keys)
            loss, grad = losses.mean(), grads.mean(axis=0)
        updates, opt_state = optimizer.update(grad, opt_state, theta)
        theta = theta + updates
        return theta, opt_state, loss

    return step


def make_single_chip_step(scene: SceneData, cfg: RenderConfig, optimizer):
    return jax.jit(make_single_chip_step_fn(scene, cfg, optimizer))


def make_batched_step(scene: SceneData, cfg: RenderConfig, optimizer,
                      mesh=None, n_keys: int = 1):
    """One jitted device program stepping ALL S scenes: the per-scene
    step (optionally ray-sharded over `mesh`) is mapped over the leading
    scene axis with lax.map — scenes run back-to-back on-device in a
    single dispatch instead of S host round-trips (each scene's render
    already fills the chip, so a sequential on-device map loses nothing
    to vmap while keeping the Pallas kernels' grid semantics intact).

    step(thetas (S,nT,3), opt_states (stacked), keys (S,), targets
    (S,H,W,3)) -> (thetas, opt_states, losses (S,))."""
    if mesh is not None:
        from inverse_path_tracer_tpu.parallel.shard import make_recover_step_fn

        inner = make_recover_step_fn(scene, cfg, mesh, optimizer)
    else:
        inner = make_single_chip_step_fn(scene, cfg, optimizer, n_keys=n_keys)

    @jax.jit
    def step(thetas, opt_states, keys, targets01):
        def one(args):
            th, st, k, tgt = args
            return inner(th, st, k, tgt)

        return jax.lax.map(one, (thetas, opt_states, keys, targets01))

    return step


def recover_materials_batched(
    scene: SceneData,
    targets01: jnp.ndarray,  # (S, H, W, 3) per-scene target images
    cfg: RenderConfig,
    steps: int = 200,
    lr: float = 5e-2,
    key: Optional[jax.Array] = None,
    mesh=None,
    log_fn: Optional[Callable[[int, float], None]] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    n_keys: int = 1,
    average_last: int = 0,
    init_materials: Optional[jnp.ndarray] = None,
    scene_chunk: int = 0,
) -> Tuple[jnp.ndarray, List[float]]:
    """Batched inverse recovery over S scenes (BASELINE.json configs
    #4/#5).  The reference's 100 scenes share geometry and differ only in
    the cube's Kd (SURVEY.md §1 data layer), so one SceneData serves all
    scenes with a per-scene parameter array theta (S, nT, 3).

    All S scenes step inside ONE compiled (optionally ray-sharded)
    device program per optimizer step (make_batched_step) — S host
    dispatches per step collapse to one.  Checkpoint/resume mirrors
    recover_materials: per-step keys are pure functions of (key, step),
    so a resumed run is bit-identical to an uninterrupted one.

    average_last = K > 0 returns the Polyak average of sigmoid(theta)
    over the final K steps instead of the last iterate: at the noise
    plateau the constant-lr Adam walk wanders around the optimum with a
    per-face radius set by that face's gradient SNR, and averaging the
    wander cuts it ~sqrt(K) at zero extra render cost — this is where
    the weakly-observed cube faces' residual lives (see
    scripts/run_recover100.py).

    scene_chunk = C > 0 dispatches each optimizer step as ceil(S/C)
    device programs of C scenes instead of one S-scene program.
    Scenes are independent (per-scene theta/opt-state/key/target), so
    the math is identical; the knob exists because the tunneled-TPU
    environment KILLS any single device program running longer than
    ~60 s (measured: a benign 190 s matmul loop dies at 62 s with "TPU
    worker process crashed or restarted"), and a 100-scene step at
    512²/256 spp is a ~160 s program.  Keep each chunk's device time
    under ~50 s.

    init_materials (S, nT, 3) in (0, 1) warm-starts theta at
    logit(init) instead of 0 (i.e. Kd = 0.5).  The intended source is
    the transport-graph GCN's predictions: the graph constrains every
    face any PATH touches (camera-hidden faces included), while the
    pixel loss only constrains camera-visible ones — the hybrid keeps
    the GCN's estimate wherever the pixel gradient is ~zero and
    sharpens the directly-observed faces.

    Returns (materials (S, nT, 3), loss curve of per-step mean loss)."""
    import os

    key = jax.random.PRNGKey(0) if key is None else key
    s = targets01.shape[0]
    opt = optax.adam(lr)
    step = make_batched_step(scene, cfg, opt, mesh=mesh, n_keys=n_keys)

    if init_materials is not None:
        m0 = jnp.clip(init_materials.astype(jnp.float32), 1e-4, 1.0 - 1e-4)
        thetas = jnp.log(m0) - jnp.log1p(-m0)
    else:
        thetas = jnp.zeros((s,) + scene.diffuse.shape, dtype=jnp.float32)
    states = jax.vmap(opt.init)(thetas)
    start_step = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

        (thetas, states), start_step = load_checkpoint(
            checkpoint_path, (thetas, states)
        )
    losses = []
    avg = None
    n_avg = 0
    # The Polyak accumulator is checkpointed alongside (thetas, states)
    # so a resume INSIDE the final-K averaging window is bit-identical
    # to an uninterrupted run (the bit-exact-resume contract).
    avg_path = (checkpoint_path + ".avg") if checkpoint_path else None
    if (
        resume
        and average_last
        and avg_path
        and os.path.exists(avg_path)
        and start_step > steps - average_last
    ):
        from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

        (avg, n_avg_a), _ = load_checkpoint(
            avg_path,
            (jnp.zeros_like(thetas), jnp.zeros((), jnp.int32)),
        )
        n_avg = int(n_avg_a)
    c = scene_chunk if 0 < scene_chunk < s else s
    for i in range(start_step, steps):
        rkey = jax.random.fold_in(key, i)
        keys = jax.vmap(lambda j: jax.random.fold_in(rkey, j))(jnp.arange(s))
        if c == s:
            thetas, states, step_losses = step(thetas, states, keys, targets01)
        else:
            parts = []
            for a in range(0, s, c):
                sl = slice(a, min(a + c, s))
                part = step(
                    jax.tree.map(lambda x: x[sl], thetas),
                    jax.tree.map(lambda x: x[sl], states),
                    keys[sl],
                    targets01[sl],
                )
                parts.append(part)
            thetas = jnp.concatenate([p[0] for p in parts])
            states = jax.tree.map(
                lambda *xs: jnp.concatenate(xs), *[p[1] for p in parts]
            )
            step_losses = jnp.concatenate([p[2] for p in parts])
        losses.append(float(step_losses.mean()))
        if average_last and i >= steps - average_last:
            m = jax.nn.sigmoid(thetas)
            avg = m if avg is None else avg + m
            n_avg += 1
        if log_fn is not None:
            log_fn(i, losses[-1])
        if checkpoint_path and checkpoint_every and (i + 1) % checkpoint_every == 0:
            from inverse_path_tracer_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, (thetas, states), step=i + 1)
            if average_last and avg is not None:
                save_checkpoint(
                    avg_path, (avg, jnp.int32(n_avg)), step=i + 1
                )
    if avg is not None and n_avg > 0:
        return avg / n_avg, losses
    return jax.nn.sigmoid(thetas), losses


def recover_materials(
    scene: SceneData,
    target01: jnp.ndarray,
    cfg: RenderConfig,
    steps: int = 200,
    lr: float = 5e-2,
    key: Optional[jax.Array] = None,
    mesh=None,
    log_fn: Optional[Callable[[int, float], None]] = None,
    resample_every: int = 1,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> Tuple[jnp.ndarray, List[float]]:
    """Recover per-triangle Kd for one scene against a target image.

    resample_every: draw a fresh render key every k steps (fresh MC
    sample sets de-bias the estimator; k=1 is SGD on the true loss).

    Checkpoint/resume (SURVEY.md §5 — absent in the reference): every
    `checkpoint_every` steps the (theta, opt_state) pytree is written
    atomically to checkpoint_path; with resume=True training continues
    from the saved step.  The per-step render key is a pure function of
    (key, step), so a resumed run is bit-identical to an uninterrupted
    one."""
    import os

    key = jax.random.PRNGKey(0) if key is None else key
    opt = optax.adam(lr)
    theta = jnp.zeros_like(scene.diffuse)
    state = opt.init(theta)
    start_step = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

        (theta, state), start_step = load_checkpoint(
            checkpoint_path, (theta, state)
        )
    if mesh is not None:
        from inverse_path_tracer_tpu.parallel.shard import make_recover_step

        step = make_recover_step(scene, cfg, mesh, opt)
    else:
        step = make_single_chip_step(scene, cfg, opt)

    losses = []
    r = max(resample_every, 1)
    for i in range(start_step, steps):
        rkey = jax.random.fold_in(key, i - i % r)
        theta, state, loss = step(theta, state, rkey, target01)
        losses.append(float(loss))
        if log_fn is not None:
            log_fn(i, losses[-1])
        if checkpoint_path and checkpoint_every and (i + 1) % checkpoint_every == 0:
            from inverse_path_tracer_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, (theta, state), step=i + 1)
    return jax.nn.sigmoid(theta), losses
