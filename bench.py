"""Benchmark harness.

Measures the driver-defined metric (BASELINE.json): rays/sec/chip,
forward and forward+backward, on the Cornell-box scene (scenes/0.txt) at
512x512, 64 spp.  "Rays" counts every traced intersection sweep: path
segments (primary + bounce) plus NEE shadow rays, from instrumented
alive-lane counts (RenderStats) — not a theoretical expectation.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}
Detail goes to stderr.  The reference publishes no numbers
(BASELINE.md), so vs_baseline is the ratio to the first recorded value
of this same harness (stored in bench_baseline.json after the first
run), i.e. the round-over-round speedup.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import load_scene

REF = "/root/reference"
BASE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_forward(scene, cfg, iters=3):
    @jax.jit
    def run(mats, key):
        vals, stats = render_samples(mats, scene, key, cfg)
        # Reduce to tiny outputs so timing excludes the D2H of 16M samples.
        return vals.sum(), stats

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    out = jax.block_until_ready(run(scene.diffuse, key))
    compile_s = time.time() - t0
    log(f"fwd compile+first run: {compile_s:.1f}s")

    times = []
    rays = None
    for i in range(iters):
        key = jax.random.PRNGKey(i + 1)
        t0 = time.time()
        s, stats = jax.block_until_ready(run(scene.diffuse, key))
        times.append(time.time() - t0)
        rays = float(stats.segments) + float(stats.shadow_rays)
    dt = min(times)
    log(f"fwd: {dt:.3f}s best of {iters}, rays={rays:.3e}, {rays/dt:.3e} rays/s")

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        from inverse_path_tracer_tpu.utils.profiling import profile_trace

        with profile_trace(profile_dir):
            jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(99)))
        log(f"fwd trace -> {profile_dir}")
    return rays / dt, rays


def bench_inverse(scene, cfg, iters=2):
    """Transport-graph extraction (the reference's createGraph) at the
    same ray workload; rays/s-equiv uses the forward ray count."""
    from inverse_path_tracer_tpu.render.inverse import (
        compress_grids,
        trace_transport_range,
    )

    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    @jax.jit
    def run(key):
        grids = trace_transport_range(
            scene, target, key, cfg, jnp.int32(0), cfg.n_samples
        )
        return compress_grids(grids, scene.n_tri)

    t0 = time.time()
    jax.block_until_ready(run(jax.random.PRNGKey(0)))
    log(f"inverse compile+first run: {time.time() - t0:.1f}s")
    times = []
    for i in range(iters):
        t0 = time.time()
        jax.block_until_ready(run(jax.random.PRNGKey(i + 1)))
        times.append(time.time() - t0)
    dt = min(times)
    log(f"inverse: {dt:.3f}s best of {iters}")
    return dt


def bench_forward_backward(scene, cfg, iters=3):
    def loss_fn(mats, key):
        vals, stats = render_samples(mats, scene, key, cfg)
        img = tonemap_mean(vals, cfg.spp)
        return img.mean(), stats

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    jax.block_until_ready(grad_fn(scene.diffuse, key))
    log(f"fwd+bwd compile+first run: {time.time() - t0:.1f}s")

    times = []
    rays = None
    for i in range(iters):
        key = jax.random.PRNGKey(i + 1)
        t0 = time.time()
        g, stats = jax.block_until_ready(grad_fn(scene.diffuse, key))
        times.append(time.time() - t0)
        rays = float(stats.segments) + float(stats.shadow_rays)
    dt = min(times)
    log(f"fwd+bwd: {dt:.3f}s best of {iters}, {rays/dt:.3e} rays/s")
    return rays / dt, rays


def bench_verify_grad(scene, backend):
    """Fused-RNG gradient correctness, enforced on hardware each round
    (VERDICT r1 weak #2): the production rng="fused"/grad_mode="custom"
    path cannot run under the CPU test suite (no PRNG lowering in
    interpret mode), so the finite-difference check runs HERE, on the
    real TPU, and its pass/fail lands in the bench JSON.

    With a fixed key the renderer is a deterministic function of the
    materials, so pathwise grad vs central finite differences along a
    random direction must agree to MC-free tolerance:
    ratio = <g, v> / FD_v ~ 1 (0.95..1.05 gate; CLAUDE.md measured
    0.98..1.01 on v5e)."""
    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(
        width=64, height=64, spp=16, max_bounces=8, tile_size=1 << 14,
        backend=backend,
        rng="fused" if on_tpu else "external",
    )
    key = jax.random.PRNGKey(7)

    @jax.jit
    def loss(mats):
        vals, _ = render_samples(mats, scene, key, cfg)
        return tonemap_mean(vals, cfg.spp).mean()

    g = jax.jit(jax.grad(loss))(scene.diffuse)
    v = jax.random.normal(jax.random.PRNGKey(11), scene.diffuse.shape)
    v = v / jnp.linalg.norm(v)
    eps = 2e-2
    lp = loss(scene.diffuse + eps * v)
    lm = loss(scene.diffuse - eps * v)
    fd = float(lp - lm) / (2 * eps)
    an = float(jnp.sum(g * v))
    ratio = an / fd if fd != 0 else float("inf")
    ok = 0.95 < ratio < 1.05
    log(f"grad verify ({cfg.rng} rng): analytic={an:.6e} fd={fd:.6e} "
        f"ratio={ratio:.4f} -> {'OK' if ok else 'FAIL'}")
    return ok, ratio, cfg.rng


def main():
    width = int(os.environ.get("BENCH_WIDTH", 512))
    height = int(os.environ.get("BENCH_HEIGHT", 512))
    spp = int(os.environ.get("BENCH_SPP", 64))
    bounces = int(os.environ.get("BENCH_BOUNCES", 16))
    tile = int(os.environ.get("BENCH_TILE", 1 << 16))

    backend = os.environ.get("BENCH_BACKEND", "pallas")

    log(f"devices: {jax.devices()}")
    scene = load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF)
    cfg = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=bounces, tile_size=tile,
        backend=backend,
    )
    log(f"config: {width}x{height} {spp}spp {bounces} bounces tile={tile} "
        f"backend={backend}")

    fwd_rps, fwd_rays = bench_forward(scene, cfg)
    # fwd+bwd: Pallas primal + fused Pallas backward megakernel (records
    # replay + suffix recursion in VMEM); same tile as the forward.
    fwdbwd_rps, _ = bench_forward_backward(scene, cfg)
    inverse_s = bench_inverse(scene, cfg)

    verify = os.environ.get("BENCH_VERIFY", "1") != "0"
    grad_ok = grad_ratio = grad_rng = None
    if verify:
        grad_ok, grad_ratio, grad_rng = bench_verify_grad(scene, backend)

    # vs_baseline: ratio to this harness's first recorded number.
    if os.path.exists(BASE_FILE):
        with open(BASE_FILE) as f:
            base = json.load(f)
    else:
        base = {"fwd_rays_per_sec": fwd_rps, "fwdbwd_rays_per_sec": fwdbwd_rps}
        try:
            with open(BASE_FILE, "w") as f:
                json.dump(base, f)
        except OSError:
            pass

    result = {
        "metric": f"rays_per_sec_fwd_cornell_{width}x{height}_{spp}spp",
        "value": fwd_rps,
        "unit": "rays/s",
        "vs_baseline": fwd_rps / base["fwd_rays_per_sec"],
        "fwd_bwd_rays_per_sec": fwdbwd_rps,
        "fwd_bwd_vs_baseline": fwdbwd_rps / base.get("fwdbwd_rays_per_sec", fwdbwd_rps),
        "inverse_extract_s": inverse_s,
        "inverse_rays_per_sec_equiv": fwd_rays / inverse_s,
    }
    if verify:
        result["grad_fd_ok"] = grad_ok
        result["grad_fd_ratio"] = grad_ratio
        result["grad_fd_rng"] = grad_rng
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
