"""Pre-snapshot hardware smoke gate.

Compiles AND runs every Pallas entry point on the current backend
(intended: the real TPU) at a small-but-real config — tile 65536 so
_pallas_block picks the production block widths, the exact failure mode
that CPU-interpret tests cannot see (the interpreter enforces no VMEM
limit; round 2 shipped a default that OOM'd scoped VMEM on hardware).

Usage (documented in CLAUDE.md as the pre-commit step for any kernel or
dispatch change):

    timeout 1200 python scripts/smoke_tpu.py [out.json]

Writes per-path {ok, seconds, error} to stdout (and out.json if given);
exits nonzero if any path fails.  ~2 min hot, longer on first compile.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import (
    loss_and_grad_range,
    render_samples,
)
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import load_scene

REF = "/root/reference"

# Small-but-real: 4 full 65536-lane tiles -> production block widths
# (8192 fwd / 4096 records+staged at the 30-tri scene), 16 bounces.
BASE = RenderConfig(
    width=128, height=128, spp=16, max_bounces=16, tile_size=1 << 16,
    backend="pallas",
)


def _fwd(scene, cfg):
    def run(mats, key):
        vals, stats = render_samples(mats, scene, key, cfg)
        return vals.sum(), (stats.segments, stats.shadow_rays)

    out = jax.jit(run)(scene.diffuse, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    assert jnp.isfinite(out[0]), out


def _bwd(scene, cfg):
    def loss(mats, key):
        vals, _ = render_samples(mats, scene, key, cfg)
        return tonemap_mean(vals, cfg.spp).mean()

    g = jax.jit(jax.grad(loss))(scene.diffuse, jax.random.PRNGKey(0))
    jax.block_until_ready(g)
    assert jnp.isfinite(g).all() and float(jnp.abs(g).max()) > 0, g


def _loss_and_grad(scene, cfg):
    # The fused value-and-grad pipeline (records stream + reverse kernel
    # on mega; stage records + staged reverse on staged).
    def post(vals, _start):
        return (vals ** 2).sum()

    def run(mats, key):
        return loss_and_grad_range(
            mats, scene, key, cfg, jnp.int32(0), cfg.n_samples, post
        )

    loss, g, _stats = jax.jit(run)(scene.diffuse, jax.random.PRNGKey(1))
    jax.block_until_ready(g)
    assert jnp.isfinite(loss) and jnp.isfinite(g).all(), (loss, g)


def _inverse(scene, cfg):
    from inverse_path_tracer_tpu.render.inverse import (
        compress_grids,
        trace_transport_range,
    )

    target = jnp.full((cfg.height, cfg.width, 3), 0.5, jnp.float32)

    def run(key):
        grids = trace_transport_range(
            scene, target, key, cfg, jnp.int32(0), cfg.n_samples
        )
        return compress_grids(grids, scene.n_tri)

    w, p, l = jax.jit(run)(jax.random.PRNGKey(2))
    jax.block_until_ready(w)
    assert jnp.isfinite(w).all() and jnp.isfinite(p).all(), (w, p, l)


def paths(scene, vn_scene):
    mega = BASE.with_(wavefront="mega")
    staged = BASE.with_(wavefront="staged")
    return [
        ("mega_fwd_fused_rng", lambda: _fwd(scene, mega)),
        ("mega_fwd_external_rng", lambda: _fwd(scene, mega.with_(rng="external"))),
        ("mega_bwd_fused_rng", lambda: _bwd(scene, mega)),
        ("mega_loss_and_grad", lambda: _loss_and_grad(scene, mega)),
        ("mega_bwd_records_mode",
         lambda: _bwd(scene, mega.with_(grad_mode="records", rng="external"))),
        ("staged_fwd", lambda: _fwd(scene, staged)),
        ("staged_loss_and_grad", lambda: _loss_and_grad(scene, staged)),
        ("inverse_fused", lambda: _inverse(scene, mega)),
        ("vn_mega_fwd", lambda: _fwd(vn_scene, mega)),
        ("vn_mega_bwd", lambda: _bwd(vn_scene, mega)),
        # Large-scene records-mode inverse (HBM edge stream + XLA
        # error-compensated sort/segment reduction): the sphere is past
        # the dense-VMEM accumulator's fits gate, so this exercises the
        # rec kernel end to end.
        ("vn_inverse_rec", lambda: _inverse(vn_scene, BASE)),
        ("staged_fwd_while_loop",
         lambda: _fwd(scene, staged.with_(stage_loop="while"))),
        ("default_cfg_fwd", lambda: _fwd(scene, BASE)),  # whatever "auto" resolves to
    ]


def main():
    t0 = time.time()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr, flush=True)
    scene = load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF)
    # Warm the tunnel with a tiny compile first (wedged remote-compile
    # mitigation; CLAUDE.md gotcha).
    _fwd(scene, BASE.with_(width=16, height=16, spp=2, max_bounces=2,
                           tile_size=512))
    print(f"warmup done ({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)
    # Cornell + sphere: the vertex-normal (smooth-shaded) kernel variant.
    from inverse_path_tracer_tpu.scene.dsl import ObjectParams
    from inverse_path_tracer_tpu.scene.build import build_scene

    vn_scene = build_scene(
        [
            ObjectParams(pos=(0, 0, 4), scl=(2, 2, 2),
                         obj_file=f"{REF}/CornellBox/CornellBox-Empty-CO.obj",
                         mtl_file=f"{REF}/CornellBox/CornellBox-Empty-CO.mtl"),
            ObjectParams(pos=(0, -1.5, 4),
                         obj_file=f"{REF}/shapes/sphere.obj",
                         mtl_file="*Kd 0.5 0.5 0.5*"),
        ]
    )

    results = {}
    failed = []
    for name, fn in paths(scene, vn_scene):
        t = time.time()
        try:
            fn()
            results[name] = {"ok": True, "seconds": round(time.time() - t, 2)}
        except Exception as e:  # noqa: BLE001 — the gate must survive any kernel failure
            msg = f"{type(e).__name__}: {e}"
            results[name] = {"ok": False, "seconds": round(time.time() - t, 2),
                             "error": msg[:500]}
            failed.append(name)
        print(f"{name}: {results[name]}", file=sys.stderr, flush=True)

    out = {"backend": jax.default_backend(), "total_seconds":
           round(time.time() - t0, 1), "failed": failed, "paths": results}
    print(json.dumps(out), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
