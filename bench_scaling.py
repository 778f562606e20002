"""Sharding-scaling benchmark.

Measures sharded-render throughput vs device count.  On real multi-chip
hardware this yields rays/s scaling efficiency (BASELINE target: >=80%
at 2+ hosts); on a single-chip/virtual-CPU environment it validates the
machinery and prints per-N timings (virtual CPU devices share the same
cores, so efficiency numbers there are NOT meaningful — the point is
that the same SPMD program runs at any N).

Usage:
  python bench_scaling.py                 # real devices (axon TPU: N=1)
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py             # 8 virtual CPU devices
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.parallel.shard import make_mesh, render_samples_sharded
from inverse_path_tracer_tpu.scene.build import load_scene


def main():
    width = int(os.environ.get("BENCH_WIDTH", 128))
    spp = int(os.environ.get("BENCH_SPP", 16))
    scene = load_scene("/root/reference/scenes/0.txt", asset_root="/root/reference")
    n_dev_all = len(jax.devices())
    results = {}
    for n in [1, 2, 4, 8]:
        if n > n_dev_all:
            break
        # keep per-device work constant-ish and tiles aligned
        cfg = RenderConfig(
            width=width, height=width, spp=spp, max_bounces=8, tile_size=2048
        )
        mesh = make_mesh(n)

        def run(key):
            vals, stats = render_samples_sharded(scene.diffuse, scene, key, cfg, mesh)
            return vals.sum(), stats

        run_j = jax.jit(run)
        jax.block_until_ready(run_j(jax.random.PRNGKey(0)))
        t0 = time.time()
        _, stats = jax.block_until_ready(run_j(jax.random.PRNGKey(1)))
        dt = time.time() - t0
        rays = float(stats.segments) + float(stats.shadow_rays)
        results[n] = rays / dt
        print(
            f"devices={n}: {dt:.3f}s {rays/dt:.3e} rays/s"
            + (
                f"  efficiency={rays/dt/(n*results[1]):.1%}"
                if 1 in results and n > 1
                else ""
            ),
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"metric": "scaling_rays_per_sec", "results": results}))


if __name__ == "__main__":
    main()
