"""Per-scene forward-kernel micro-benchmark (perf work tool).

Measures fwd (and optionally fwd+bwd) rays/s on a named scene config:
  python scripts/bench_scene.py sphere       # Cornell + 1280-tri vn sphere
  python scripts/bench_scene.py cornell      # scenes/0.txt (bench.py scene)
Knobs: BENCH_WIDTH/HEIGHT/SPP/BOUNCES/TILE/BACKEND, BENCH_BWD=1.
Prints one JSON line; detail on stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import build_scene, load_scene
from inverse_path_tracer_tpu.scene.dsl import ObjectParams

REF = "/root/reference"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sphere_scene():
    """Cornell (flat, emissive) + unit sphere (1280 tris, vertex normals):
    the VERDICT r1 weak-#7 large-scene workload (shapes/sphere.obj)."""
    return build_scene(
        [
            ObjectParams(
                pos=(0, 0, 4),
                scl=(2, 2, 2),
                obj_file=f"{REF}/CornellBox/CornellBox-Empty-CO.obj",
                mtl_file=f"{REF}/CornellBox/CornellBox-Empty-CO.mtl",
            ),
            ObjectParams(
                pos=(0, -1.5, 4),
                obj_file=f"{REF}/shapes/sphere.obj",
                mtl_file="*Kd 0.5 0.5 0.5*",
            ),
        ]
    )


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "sphere"
    width = int(os.environ.get("BENCH_WIDTH", 512))
    height = int(os.environ.get("BENCH_HEIGHT", 512))
    spp = int(os.environ.get("BENCH_SPP", 64))
    bounces = int(os.environ.get("BENCH_BOUNCES", 16))
    tile = int(os.environ.get("BENCH_TILE", 1 << 16))
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    wavefront = os.environ.get("BENCH_WAVEFRONT", "auto")
    rng = os.environ.get("BENCH_RNG", "auto")
    stage_bounces = int(os.environ.get("BENCH_STAGE_BOUNCES", 4))
    stage_loop = os.environ.get("BENCH_STAGE_LOOP", "fori")
    cluster_k = int(os.environ.get("BENCH_CLUSTER_K", 0))
    tri_order = os.environ.get("BENCH_TRI_ORDER", "morton")

    log(f"devices: {jax.devices()}")
    if name == "sphere":
        scene = sphere_scene()
    else:
        scene = load_scene(f"{REF}/scenes/0.txt", asset_root=REF)
    cfg = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=bounces,
        tile_size=tile, backend=backend, wavefront=wavefront, rng=rng,
        stage_bounces=stage_bounces, stage_loop=stage_loop,
        cluster_k=cluster_k, tri_order=tri_order,
    )
    log(f"scene={name} nT={scene.vertices.shape[0]} vn={scene.vertex_normals.shape[1] != 0} "
        f"{width}x{height} {spp}spp {bounces}b tile={tile} backend={backend} wavefront={wavefront}")

    @jax.jit
    def run(mats, key):
        vals, stats = render_samples(mats, scene, key, cfg)
        return vals.sum(), stats

    t0 = time.time()
    jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(0)))
    log(f"fwd compile+first: {time.time() - t0:.1f}s")
    times, rays = [], None
    for i in range(3):
        t0 = time.time()
        _, stats = jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(i + 1)))
        times.append(time.time() - t0)
        rays = float(stats.segments) + float(stats.shadow_rays)
    dt = min(times)
    log(f"fwd: {dt:.3f}s best of 3, rays={rays:.3e}, {rays/dt:.3e} rays/s")
    out = {"metric": f"rays_per_sec_fwd_{name}", "value": rays / dt,
           "unit": "rays/s", "seconds": dt}

    if os.environ.get("BENCH_BWD", "0") == "1":
        def loss_fn(mats, key):
            vals, stats = render_samples(mats, scene, key, cfg)
            return tonemap_mean(vals, cfg.spp).mean(), stats

        grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
        t0 = time.time()
        jax.block_until_ready(grad_fn(scene.diffuse, jax.random.PRNGKey(0)))
        log(f"fwd+bwd compile+first: {time.time() - t0:.1f}s")
        times = []
        for i in range(3):
            t0 = time.time()
            _, stats = jax.block_until_ready(grad_fn(scene.diffuse, jax.random.PRNGKey(i + 1)))
            times.append(time.time() - t0)
        dt = min(times)
        log(f"fwd+bwd: {dt:.3f}s best of 3, {rays/dt:.3e} rays/s")
        out["fwd_bwd_rays_per_sec"] = rays / dt

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
