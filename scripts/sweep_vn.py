"""Same-process A/B sweep of the large-scene (vn sphere) forward kernel.

The tunneled v5e's throughput drifts ~20% between sessions, so ONLY
back-to-back measurements inside one process are trusted (CLAUDE.md).
This sweeps RenderConfig variants (cluster_k / pair_sweep / bin_cells /
stage_bounces / wavefront are all static dataclass fields, so each
variant is a distinct jit cache entry) and re-measures the baseline
LAST to bound within-process drift.

    timeout 3600 python scripts/sweep_vn.py [variant ...]

With no args runs the default sweep list.  Prints one JSON line with
every variant's best-of-3 rays/s; detail on stderr.
Knobs: BENCH_WIDTH/HEIGHT/SPP/BOUNCES/TILE (default 512x512/64/16/65536).
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.scene.build import build_scene
from inverse_path_tracer_tpu.scene.dsl import ObjectParams

REF = "/root/reference"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sphere_scene():
    return build_scene([
        ObjectParams(pos=(0, 0, 4), scl=(2, 2, 2),
                     obj_file=f"{REF}/CornellBox/CornellBox-Empty-CO.obj",
                     mtl_file=f"{REF}/CornellBox/CornellBox-Empty-CO.mtl"),
        ObjectParams(pos=(0, -1.5, 4), obj_file=f"{REF}/shapes/sphere.obj",
                     mtl_file="*Kd 0.5 0.5 0.5*"),
    ])


# label -> cfg overrides (applied to the bench base config).
VARIANTS = {
    "base":         dict(),  # shipped auto: k=tp/2=768, sb4, fori, union
    "split":        dict(pair_sweep="split"),  # per-ray cold-segment skip
    "cells4":       dict(bin_cells=4),
    "base_again":   dict(),  # drift bound
}


def measure(scene, cfg, label, iters=3):
    @jax.jit
    def run(mats, key):
        vals, stats = render_samples(mats, scene, key, cfg)
        return vals.sum(), stats

    t0 = time.time()
    jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    times, rays = [], None
    for i in range(iters):
        t0 = time.time()
        _, stats = jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(i + 1)))
        times.append(time.time() - t0)
        rays = float(stats.segments) + float(stats.shadow_rays)
    med = sorted(times)[len(times) // 2]
    # Guard against async-dispatch glitches (a 0.001s "iteration" was
    # observed once): only trust iters within 2x of the median.
    dt = min(t for t in times if t >= 0.5 * med)
    log(f"{label}: {rays/dt/1e6:.2f}M rays/s (best {dt:.3f}s, "
        f"all {[round(t,3) for t in times]}, compile {compile_s:.1f}s)")
    return {"rays_per_sec": rays / dt, "seconds": dt,
            "spread": [round(t, 4) for t in times],
            "compile_s": round(compile_s, 1)}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    width = int(os.environ.get("BENCH_WIDTH", 512))
    height = int(os.environ.get("BENCH_HEIGHT", 512))
    spp = int(os.environ.get("BENCH_SPP", 64))
    bounces = int(os.environ.get("BENCH_BOUNCES", 16))
    tile = int(os.environ.get("BENCH_TILE", 1 << 16))
    base = RenderConfig(width=width, height=height, spp=spp,
                        max_bounces=bounces, tile_size=tile, backend="pallas")
    log(f"devices: {jax.devices()}")
    scene = sphere_scene()
    log(f"scene: nT={scene.vertices.shape[0]}, {width}x{height}/{spp}spp/{bounces}b")
    # Warm the tunnel with a tiny compile first: a fresh process going
    # straight to a large Mosaic compile has been observed to wedge the
    # remote compile service (2026-08-20, twice); a small first contact
    # avoids it.
    t0 = time.time()
    jax.block_until_ready(render_samples(
        scene.diffuse, scene,
        jax.random.PRNGKey(0),
        base.with_(width=32, height=32, spp=2, max_bounces=4, tile_size=2048),
    ))
    log(f"warmup: {time.time()-t0:.1f}s")

    out = {}
    for name in names:
        ov = VARIANTS[name]
        out[name] = measure(scene, base.with_(**ov), name)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
