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

Resilience: every section runs under try/except and reports into the
"paths" status map; a Pallas kernel failure falls back to the XLA
backend for that section (with an "error" field) instead of crashing
the harness — the reference's createImage/createGraph always produce
output (path_trace.cu:227, inv_path_trace.cu:195), and so does this.

Knobs (env): BENCH_WIDTH/HEIGHT/SPP/BOUNCES/TILE, BENCH_BACKEND,
BENCH_WAVEFRONT, BENCH_RNG, BENCH_GRAD_MODE, BENCH_INTERSECT,
BENCH_VERIFY=0, BENCH_GOLDEN=0, BENCH_VN=0, BENCH_PROFILE=<dir>.
"""

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.render.forward import render_samples
from inverse_path_tracer_tpu.ops.tonemap import tonemap_mean
from inverse_path_tracer_tpu.scene.build import build_scene, load_scene
from inverse_path_tracer_tpu.scene.dsl import ObjectParams

REF = "/root/reference"
BASE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")

PATHS = {}  # section -> {ok, seconds, [error]}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def section(name, fn, fallback=None):
    """Run one bench section; on failure record the error and run the
    fallback (typically the same measurement on the XLA backend)."""
    t0 = time.time()
    try:
        out = fn()
        PATHS[name] = {"ok": True, "seconds": round(time.time() - t0, 1)}
        return out
    except Exception as e:  # noqa: BLE001 — the harness must always emit JSON
        log(f"{name} FAILED: {type(e).__name__}: {e}")
        traceback.print_exc(file=sys.stderr)
        PATHS[name] = {
            "ok": False,
            "seconds": round(time.time() - t0, 1),
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }
        if fallback is not None:
            log(f"{name}: falling back to XLA")
            try:
                out = section(name + "_xla_fallback", fallback)
                return out
            except Exception:  # pragma: no cover
                pass
        return None


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
    med = sorted(times)[len(times) // 2]
    dt = min(t for t in times if t >= 0.5 * med)  # glitch guard
    log(f"fwd: {dt:.3f}s best of {iters} {[round(t, 3) for t in times]}, "
        f"rays={rays:.3e}, {rays/dt:.3e} rays/s")

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        from inverse_path_tracer_tpu.utils.profiling import profile_trace

        with profile_trace(profile_dir):
            jax.block_until_ready(run(scene.diffuse, jax.random.PRNGKey(99)))
        log(f"fwd trace -> {profile_dir}")
    return rays / dt, rays, dt, times


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
    med = sorted(times)[len(times) // 2]
    dt = min(t for t in times if t >= 0.5 * med)  # glitch guard
    log(f"inverse: {dt:.3f}s best of {iters} {[round(t, 3) for t in times]}")
    return dt, times


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
    med = sorted(times)[len(times) // 2]
    dt = min(t for t in times if t >= 0.5 * med)  # glitch guard
    log(f"fwd+bwd: {dt:.3f}s best of {iters}, {rays/dt:.3e} rays/s")
    return rays / dt, rays


def vn_sphere_scene():
    """Cornell + 1280-tri vertex-normal sphere (1298 tris): the
    large-scene workload (VERDICT r1 weak #7) that exercises the
    cluster-chunked sweep + staged wavefront instead of the dense
    megakernel."""
    return build_scene([
        ObjectParams(pos=(0, 0, 4), scl=(2, 2, 2),
                     obj_file=f"{REF}/CornellBox/CornellBox-Empty-CO.obj",
                     mtl_file=f"{REF}/CornellBox/CornellBox-Empty-CO.mtl"),
        ObjectParams(pos=(0, -1.5, 4), obj_file=f"{REF}/shapes/sphere.obj",
                     mtl_file="*Kd 0.5 0.5 0.5*"),
    ])


def bench_verify_grad(scene, cfg_base):
    """Gradient correctness, enforced on hardware each round: with a
    fixed key the renderer is a deterministic polynomial in the
    materials, so pathwise grad vs central finite differences along a
    random direction must agree: ratio = <g, v> / FD_v ~ 1 (0.97..1.03
    gate; requires full-f32 matmuls — the MXU's default bf16 precision
    quantizes the materials and turns FD into noise, which is why the
    package pins jax_default_matmul_precision='highest')."""
    on_tpu = jax.default_backend() == "tpu"
    cfg = cfg_base.with_(
        width=64, height=64, spp=16, max_bounces=8, tile_size=1 << 14,
        rng=cfg_base.rng if cfg_base.rng != "auto" else (
            "fused" if on_tpu else "external"),
    )
    key = jax.random.PRNGKey(7)

    @jax.jit
    def loss(mats):
        vals, _ = render_samples(mats, scene, key, cfg)
        return tonemap_mean(vals, cfg.spp).mean()

    g = jax.jit(jax.grad(loss))(scene.diffuse)
    eps = 2e-2

    def fd_ratio(v):
        v = v / jnp.linalg.norm(v)
        lp = loss(scene.diffuse + eps * v)
        lm = loss(scene.diffuse - eps * v)
        fd = float(lp - lm) / (2 * eps)
        an = float(jnp.sum(g * v))
        return (an / fd if fd != 0 else float("inf")), an, fd

    # Gate along g itself — the well-conditioned direction (a random v
    # can be nearly orthogonal to g, where |<g,v>| is ~30x smaller and
    # benign quantization jitter in the FD evals dominates the signal;
    # measured: random-direction ratios are 0.998-1.002 except for such
    # cancelled directions).
    ratio, an, fd = fd_ratio(g)
    r_rand, an_r, fd_r = fd_ratio(
        jax.random.normal(jax.random.PRNGKey(12), scene.diffuse.shape)
    )
    # Gate at ~1.5x the measured margin (r03: ratio 1.0000) so a real
    # precision regression actually bites, not just catastrophes.
    ok = 0.98 < ratio < 1.02
    log(f"grad verify ({cfg.rng} rng): along g analytic={an:.6e} fd={fd:.6e} "
        f"ratio={ratio:.4f}; random dir ratio={r_rand:.4f} "
        f"-> {'OK' if ok else 'FAIL'}")
    if not ok:
        raise AssertionError(f"grad FD ratio {ratio:.4f} outside (0.98, 1.02)")
    return ratio, cfg.rng


def bench_golden(cfg_base):
    """Live full-resolution golden render: scene 0 at the reference's
    native 500x500/100spp on THIS hardware, pixelwise against the
    reference's committed ground truth (preds/0_true.png).  Bounds are
    ~1.3-1.5x the measured r03 margins: mean < 5/255, p99 < 25/255
    (Monte-Carlo noise at 100 spp measures 3.74/16.0)."""
    import numpy as np
    from PIL import Image

    from inverse_path_tracer_tpu.render.forward import render_to_png

    scene = load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF)
    cfg = cfg_base.with_(width=500, height=500, spp=100, max_bounces=16)
    out_png = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "bench_golden_0.png")
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    t0 = time.time()
    img8 = render_to_png(scene.diffuse, scene, jax.random.PRNGKey(1), cfg, out_png)
    dt = time.time() - t0
    ref = np.asarray(
        Image.open(os.path.join(REF, "preds/0_true.png")).convert("RGB"),
        dtype=np.float32,
    )
    d = np.abs(ref - np.asarray(img8, dtype=np.float32))
    mean, p99 = float(d.mean()), float(np.percentile(d, 99))
    # ~1.3-1.5x the measured margins (r03: mean 3.74, p99 16.0) so a
    # quality regression of tens of percent fails the gate.
    ok = mean < 5.0 and p99 < 25.0
    log(f"golden 500x500/100spp: {dt:.1f}s (incl compile), mean|d|={mean:.2f}/255 "
        f"p99={p99:.1f}/255 -> {'OK' if ok else 'FAIL'} ({out_png})")
    if not ok:
        raise AssertionError(f"golden mismatch: mean {mean:.2f} p99 {p99:.1f}")
    return mean, p99


def roofline(scene, cfg, rays, dt_fwd):
    """Algorithmic flops/bytes model of the mega forward kernel (see
    BASELINE.md 'Roofline' for the derivation and ceiling analysis).

    Counted per (lane, bounce) SIMD slot — the kernel pays every slot
    regardless of aliveness, so slots (not instrumented rays) drive the
    hardware:
      * intersect_pair  (4Tp,4)x(4,3B) -> 96*Tp flops/slot
      * table lookup    (16|35,Tp)x(Tp,B) -> 2*rows*Tp flops/slot
      * emissive lookup 2*erows*nE flops/slot
    HBM bytes: per-tile ray I/O only (tables are per-block constants).
    """
    n_tri = int(scene.vertices.shape[0])
    tp = -(-max(n_tri, 8) // 8) * 8
    has_vn = scene.vertex_normals.shape[1] != 0
    rows = 35 if has_vn else 16  # incl. the kd_hi/kd_lo split rows
    n_e = int(scene.emissive_idx.shape[0])
    tile = min(cfg.tile_size, cfg.n_samples)
    n_tiles = -(-cfg.n_samples // tile)
    slots = n_tiles * tile * cfg.max_bounces
    mm_flops_slot = 96 * tp + 2 * rows * tp + 2 * 17 * n_e
    mm_flops = slots * mm_flops_slot
    # Per-tile HBM: p,d,alive,orig in (8 rows f32) + rad,stats out (5 rows).
    hbm_bytes = n_tiles * tile * (8 + 5) * 4
    peak_bf16 = 197e12  # v5e MXU peak (bf16 MACs)
    mxu_passes = 1  # all kernel dots run one bf16 pass (see render_kernel.py)
    mfu = (mm_flops * mxu_passes) / dt_fwd / peak_bf16
    out = {
        "flops_per_ray_matmul": mm_flops / rays,
        "bytes_per_ray": hbm_bytes / rays,
        "hbm_gb_per_s": hbm_bytes / dt_fwd / 1e9,
        "mfu_estimate": mfu,
        "slots_per_ray": slots / rays,
    }
    log(f"roofline: {mm_flops/1e12:.2f} algorithmic matmul TFLOP/render, "
        f"MFU~{mfu*100:.1f}% (x{mxu_passes} f32 passes), "
        f"HBM {out['hbm_gb_per_s']:.1f} GB/s, {out['bytes_per_ray']:.0f} B/ray "
        f"-> VPU/transcendental-bound, not MXU/HBM")
    return out


def main():
    width = int(os.environ.get("BENCH_WIDTH", 512))
    height = int(os.environ.get("BENCH_HEIGHT", 512))
    spp = int(os.environ.get("BENCH_SPP", 64))
    bounces = int(os.environ.get("BENCH_BOUNCES", 16))
    tile = int(os.environ.get("BENCH_TILE", 1 << 16))

    backend = os.environ.get("BENCH_BACKEND", "pallas")
    wavefront = os.environ.get("BENCH_WAVEFRONT", "auto")
    rng = os.environ.get("BENCH_RNG", "auto")
    grad_mode = os.environ.get("BENCH_GRAD_MODE", "custom")
    intersect = os.environ.get("BENCH_INTERSECT", "auto")
    stage_loop = os.environ.get("BENCH_STAGE_LOOP", "fori")
    cluster_k = int(os.environ.get("BENCH_CLUSTER_K", 0))

    log(f"devices: {jax.devices()}")
    scene = load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF)
    # Warm the tunnel with a tiny compile first: a fresh process going
    # straight to a large Mosaic compile can wedge the remote compile
    # service for 400+ s (CLAUDE.md gotcha, observed repeatedly
    # 2026-08-20/21).
    t0 = time.time()
    try:
        from inverse_path_tracer_tpu.render.forward import render_samples as _rs
        jax.block_until_ready(_rs(
            scene.diffuse, scene, jax.random.PRNGKey(0),
            RenderConfig(width=32, height=32, spp=2, max_bounces=4,
                         tile_size=2048, backend=backend),
        ))
        log(f"warmup: {time.time()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        log(f"warmup failed (continuing): {e}")
    cfg = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=bounces, tile_size=tile,
        backend=backend, wavefront=wavefront, rng=rng, grad_mode=grad_mode,
        intersect=intersect, stage_loop=stage_loop, cluster_k=cluster_k,
    )
    cfg_xla = cfg.with_(backend="xla")
    log(f"config: {width}x{height} {spp}spp {bounces} bounces tile={tile} "
        f"backend={backend} wavefront={wavefront} rng={rng} grad_mode={grad_mode}")

    fwd = section("fwd", lambda: bench_forward(scene, cfg),
                  fallback=lambda: bench_forward(scene, cfg_xla))
    fwd_rps, fwd_rays, fwd_dt = fwd[:3] if fwd else (0.0, 1.0, 1.0)
    fwdbwd = section("fwd_bwd", lambda: bench_forward_backward(scene, cfg),
                     fallback=lambda: bench_forward_backward(scene, cfg_xla))
    fwdbwd_rps = fwdbwd[0] if fwdbwd else 0.0
    inv = section("inverse", lambda: bench_inverse(scene, cfg),
                  fallback=lambda: bench_inverse(scene, cfg_xla))
    inverse_s = inv[0] if inv else None

    verify = os.environ.get("BENCH_VERIFY", "1") != "0"
    grad_ratio = grad_rng = None
    if verify:
        vg = section("grad_fd", lambda: bench_verify_grad(scene, cfg))
        if vg:
            grad_ratio, grad_rng = vg

    golden = os.environ.get("BENCH_GOLDEN", "1") != "0"
    golden_stats = None
    if golden:
        golden_stats = section("golden", lambda: bench_golden(cfg))

    vn_rps = vn_spread = vn_ext_s = vn_ext_spread = None
    result_vn_inv = vn_inv_x = None
    if os.environ.get("BENCH_VN", "1") != "0":
        # best-of-3 + per-iter spread: the tunneled chip drifts ~20%
        # between sessions, so the spread is recorded to make
        # round-over-round comparisons of this number interpretable.
        vn = section("vn_sphere",
                     lambda: bench_forward(vn_sphere_scene(), cfg, iters=3))
        if vn:
            vn_rps = vn[0]
            vn_spread = [round(t, 4) for t in vn[3]]

        # Default, cheap: the records-path extraction ALONE (no XLA
        # oracle) at a fixed reduced config, best-of-3 with recorded
        # spread — the tracked round-over-round vn-extraction number
        # (VERDICT r4 weak #4: the records perf lived only in opt-in
        # artifacts before).
        def vn_extract():
            sc = vn_sphere_scene()
            small = cfg.with_(width=128, height=128, spp=8,
                              backend="pallas")
            return bench_inverse(sc, small, iters=3)

        vne = section("vn_extract", vn_extract)
        if vne:
            vn_ext_s = vne[0]
            vn_ext_spread = [round(t, 4) for t in vne[1]]

        if os.environ.get("BENCH_VN_INV", "0") == "1":
            # Opt-in only because the XLA-oracle comparison costs
            # minutes at any realistic config; the records kernel
            # itself is benched by the default vn_extract section.
            vn_inv = section(
                "vn_inverse",
                lambda: bench_inverse(vn_sphere_scene(),
                                      cfg.with_(backend="pallas"), iters=2),
            )
            result_vn_inv = vn_inv[0] if vn_inv else None

            # Records-path vs XLA-oracle extraction ratio at the same
            # reduced config (the oracle is O(nT^2)-per-lane work).
            def vn_inv_ratio():
                sc = vn_sphere_scene()
                small = cfg.with_(width=128, height=128, spp=8,
                                  backend="pallas")
                t_rec, _ = bench_inverse(sc, small, iters=2)
                t_xla, _ = bench_inverse(sc, small.with_(backend="xla"),
                                         iters=1)
                log(f"vn inverse 128x128/8spp: records {t_rec:.2f}s vs XLA "
                    f"{t_xla:.2f}s -> {t_xla/t_rec:.1f}x")
                return t_xla / t_rec

            vn_inv_x = section("vn_inverse_ratio", vn_inv_ratio)

    roof = section("roofline", lambda: roofline(scene, cfg, fwd_rays, fwd_dt))

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
        "inverse_rays_per_sec_equiv": (fwd_rays / inverse_s) if inverse_s else None,
    }
    if vn_rps is not None:
        result["vn_sphere_rays_per_sec"] = vn_rps
        result["vn_sphere_seconds_spread"] = vn_spread
    if vn_ext_s is not None:
        result["vn_extract_s_128x128_8spp"] = vn_ext_s
        result["vn_extract_seconds_spread"] = vn_ext_spread
    if result_vn_inv is not None:
        result["vn_inverse_extract_s"] = result_vn_inv
    if vn_inv_x is not None:
        result["vn_inverse_speedup_vs_xla"] = vn_inv_x
    if verify:
        result["grad_fd_ok"] = PATHS.get("grad_fd", {}).get("ok", False)
        result["grad_fd_ratio"] = grad_ratio
        result["grad_fd_rng"] = grad_rng
    if golden:
        result["golden_ok"] = PATHS.get("golden", {}).get("ok", False)
        if golden_stats:
            result["golden_mean_255"], result["golden_p99_255"] = golden_stats
    if roof:
        result.update(roof)
    result["paths"] = PATHS
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
