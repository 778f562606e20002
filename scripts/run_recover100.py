"""BASELINE.json config #5, single-host: batched gradient recovery over
ALL 100 reference scenes (reference's own scenes/*.txt — the reference
generates these 100 scenes in ipt_cuda.py:115-134 but never recovers
them; this run beats it at its own scale).

Phases (each timed into artifacts/exp100/metrics.json "recover100"):
  1. render the 100 target images at RES^2 / SPP spp with the true
     materials (our renderer; one cached jit, TPU);
  2. batched recovery: per-scene theta (100, nT, 3), one compiled device
     program per optimizer step, checkpoint every 25 steps
     (runs/recover100/ckpt.npz — resumable);
  3. report mean |Kd err| vs the scene files' true Kd, write sample
     recovered re-renders to artifacts/exp100/recover100_*.png.

Usage: timeout 5400 python scripts/run_recover100.py [--steps 200]
Knobs: R100_RES (256), R100_SPP (64), R100_TARGET_SPP (= R100_SPP),
R100_KEYS (1; gradient keys averaged per step), R100_STEPS,
R100_SCENES (100), R100_LR (5e-2), R100_RUN (run-dir/metrics tag,
default "recover100" — use a fresh tag for diagnostic configs so they
don't resume the production checkpoint).
Because per-step RNG keys are pure functions of
(key, step), a resumed run continues bit-exactly; resuming past a
finished schedule with a smaller R100_LR implements a two-phase lr
decay (the constant-lr Adam walk plateaus at the Monte-Carlo gradient
noise floor — dropping lr 5x collapses the walk radius around the
optimum, which is where the per-scene cube Kd error lives).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.scene.build import load_scene
from inverse_path_tracer_tpu.render.forward import render_to_png
from inverse_path_tracer_tpu.data.pipeline import load_image01

REF = "/root/reference"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAG = os.environ.get("R100_RUN", "recover100")
RUN = os.path.join(ROOT, "runs", TAG)
ART = os.path.join(ROOT, "artifacts", "exp100")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int,
                    default=int(os.environ.get("R100_STEPS", 200)))
    args = ap.parse_args()
    res = int(os.environ.get("R100_RES", 256))
    spp = int(os.environ.get("R100_SPP", 64))
    target_spp = int(os.environ.get("R100_TARGET_SPP", spp))
    n_keys = int(os.environ.get("R100_KEYS", 1))
    avg_last = int(os.environ.get("R100_AVG", 0))
    n = int(os.environ.get("R100_SCENES", 100))
    # Scenes per device program.  The tunneled TPU kills any single
    # program over ~60 s (see recover_materials_batched docstring), so
    # large-res/spp configs must chunk; keep chunks under ~50 s of
    # device time and divide n to avoid a ragged-shape recompile.
    scene_chunk = int(os.environ.get("R100_SCENE_CHUNK", 0))
    cfg = RenderConfig(width=res, height=res, spp=spp, max_bounces=16,
                       tile_size=1 << 16)
    target_cfg = cfg.with_(spp=target_spp)
    os.makedirs(RUN, exist_ok=True)
    log(f"devices: {jax.devices()}; {n} scenes at {res}x{res}/{spp}spp "
        f"(targets {target_spp}spp, {n_keys} grad keys/step), "
        f"{args.steps} steps -> {RUN}")

    lr = float(os.environ.get("R100_LR", 5e-2))
    metrics = {"config": {"n": n, "res": res, "spp": spp,
                          "target_spp": target_spp, "n_keys": n_keys,
                          "avg_last": avg_last, "lr": lr,
                          "steps": args.steps,
                          "scene_chunk": scene_chunk,
                          "devices": [str(d) for d in jax.devices()]}}

    # Warm the tunnel with a tiny compile first: a fresh process going
    # straight to a large Mosaic compile has been observed to wedge the
    # remote compile service (CLAUDE.md gotcha).
    t0 = time.time()
    from inverse_path_tracer_tpu.render.forward import render_samples
    jax.block_until_ready(render_samples(
        load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF).diffuse,
        load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF),
        jax.random.PRNGKey(0),
        cfg.with_(width=32, height=32, spp=2, max_bounces=4, tile_size=2048),
    ))
    log(f"warmup: {time.time()-t0:.1f}s")

    # --- Phase 1: targets ---
    t0 = time.time()
    key = jax.random.PRNGKey(100)
    scenes = []
    for i in range(n):
        p = os.path.join(RUN, f"{i}.png")
        scene = load_scene(os.path.join(REF, "scenes", f"{i}.txt"),
                           asset_root=REF)
        scenes.append(scene)
        if not os.path.exists(p):
            render_to_png(scene.diffuse, scene, jax.random.fold_in(key, i),
                          target_cfg, p)
        if i % 20 == 0:
            log(f"target {i} done ({time.time()-t0:.0f}s)")
    metrics["targets_wall_s"] = round(time.time() - t0, 1)
    log(f"targets: {metrics['targets_wall_s']}s")

    # --- Phase 2: batched recovery ---
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched

    targets = jnp.stack([load_image01(os.path.join(RUN, f"{i}.png"))
                         for i in range(n)])
    labels = np.stack([np.asarray(s.diffuse) for s in scenes])

    init_mats = None
    if os.environ.get("R100_INIT", "") == "gcn":
        # Hybrid inverse: warm-start from the transport-graph GCN's
        # predictions (trained on the 500^2/100spp 100-scene graphs,
        # artifacts/exp100).  The graph constrains every face any PATH
        # touches — including camera-hidden cube faces the pixel loss
        # cannot see — so the refinement keeps those estimates (their
        # pixel gradient is ~0) and sharpens the visible ones.
        from inverse_path_tracer_tpu.models.gcn import (
            build_dense_graph, gcn_forward, init_gcn,
        )
        from inverse_path_tracer_tpu.render.inverse import extract_graph
        from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

        params, _ = load_checkpoint(os.path.join(ART, "gcn_params.npz"),
                                    init_gcn(jax.random.PRNGKey(0)))
        # Extract THESE scenes' transport graphs at the GCN's training
        # statistics (500^2/100spp, the reference's native workload;
        # graph weights are sample-count dependent through log(w+1), so
        # matching the training distribution matters).  This is a TRUE
        # generalization use of the GCN: it was trained on a different
        # seeded scene set with the same geometry.
        g_cfg = cfg.with_(width=500, height=500, spp=100)
        gdir = os.path.join(RUN, "graph500")
        os.makedirs(gdir, exist_ok=True)
        init_npy = os.path.join(RUN, "gcn_init.npy")
        t0g = time.time()
        preds = []
        if os.path.exists(init_npy):
            init_mats = jnp.asarray(np.load(init_npy))
            log("gcn init loaded from cache")
        else:
            for i in range(n):
                gp = os.path.join(gdir, f"{i}.png")
                if not os.path.exists(gp):
                    render_to_png(scenes[i].diffuse, scenes[i],
                                  jax.random.fold_in(key, 50_000 + i),
                                  g_cfg, gp)
                img = load_image01(gp)
                w, pix, _l = extract_graph(
                    scenes[i], img,
                    jax.random.fold_in(jax.random.PRNGKey(500), i), g_cfg,
                )
                adj, feats = build_dense_graph(w, pix)
                preds.append(gcn_forward(params, adj, feats))
                if i % 20 == 0:
                    log(f"graph+gcn {i} done ({time.time()-t0g:.0f}s)")
            init_mats = jnp.stack(preds)
            np.save(init_npy, np.asarray(init_mats))
        metrics["gcn_graphs_wall_s"] = round(time.time() - t0g, 1)
        ie = np.abs(np.asarray(init_mats) - labels)
        metrics["gcn_init_err"] = float(ie.mean())
        metrics["gcn_init_err_cube"] = float(ie[:, 18:, :].mean())
        metrics["gcn_init_per_face_cube_err"] = [
            round(float(v), 4) for v in ie[:, 18:, :].mean(axis=(0, 2))
        ]
        metrics["config"]["init"] = "gcn"
        log(f"gcn init: mean |err| vs labels "
            f"{float(np.abs(np.asarray(init_mats) - labels).mean()):.4f}")

    t0 = time.time()
    losses_path = os.path.join(RUN, "losses.jsonl")
    lf = open(losses_path, "a")

    def log_fn(s, l):
        if s % 10 == 0:
            log(f"step {s}: loss {l:.6f} ({time.time()-t0:.0f}s)")
        lf.write(json.dumps({"step": s, "loss": l}) + "\n")
        lf.flush()

    mats, losses = recover_materials_batched(
        scenes[0], targets, cfg, steps=args.steps, lr=lr,
        key=jax.random.PRNGKey(0), log_fn=log_fn,
        checkpoint_path=os.path.join(RUN, "ckpt.npz"), checkpoint_every=25,
        resume=True, n_keys=n_keys, average_last=avg_last,
        init_materials=init_mats, scene_chunk=scene_chunk,
    )
    lf.close()
    metrics["recover_wall_s"] = round(time.time() - t0, 1)
    mats_np = np.asarray(mats)
    np.save(os.path.join(RUN, "recovered.npy"), mats_np)

    err = np.abs(mats_np - labels)
    # The cube triangles (the learnable unknowns; Cornell Kd is shared
    # across scenes) are the last 12.
    err_cube = err[:, 18:, :]
    metrics["mean_kd_err"] = float(err.mean())
    metrics["mean_kd_err_cube"] = float(err_cube.mean())
    metrics["per_face_cube_err"] = [
        round(float(v), 4) for v in err_cube.mean(axis=(0, 2))
    ]
    metrics["max_scene_err"] = float(err.mean(axis=(1, 2)).max())
    metrics["final_loss"] = losses[-1] if losses else None
    log(f"recover: {metrics['recover_wall_s']}s, mean |Kd err| "
        f"{metrics['mean_kd_err']:.4f} (cube {metrics['mean_kd_err_cube']:.4f})")

    # --- Phase 3: sample re-renders ---
    t0 = time.time()
    for i in (0, 50, 99):
        if i >= n:
            continue
        render_to_png(jnp.asarray(mats_np[i]), scenes[i],
                      jax.random.fold_in(key, 10_000 + i), cfg,
                      os.path.join(ART, f"{TAG}_{i}_pred.png"))
        render_to_png(scenes[i].diffuse, scenes[i],
                      jax.random.fold_in(key, 10_000 + i), cfg,
                      os.path.join(ART, f"{TAG}_{i}_true.png"))
    metrics["rerender_wall_s"] = round(time.time() - t0, 1)

    # Merge into the exp100 metrics file.
    mpath = os.path.join(ART, "metrics.json")
    with open(mpath) as f:
        all_m = json.load(f)
    all_m[TAG] = metrics
    with open(mpath, "w") as f:
        json.dump(all_m, f, indent=1)
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
