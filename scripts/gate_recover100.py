"""Label-free observability gate + hybrid estimator assembly for the
config-#5 recovery runs (BASELINE.json milestone 5; the per-triangle Kd
estimate is the reference's entire inverse product, ipt.py:86-140).

The round-4 diagnosis (artifacts/exp100/ANALYSIS.md): recovery error
decomposes by per-face observability, and each estimator wins exactly
where it has information —
  * pixel-loss refinement solves the directly-visible faces (their Kd
    multiplies the radiance of many camera-ray pixels) and random-walks
    the rest at the Monte-Carlo noise floor;
  * the transport-graph GCN constrains every face any PATH touches
    (camera-hidden faces included) but is less sharp on visible ones.

The gate here is computed WITHOUT ground-truth labels, from quantities
the inverse pipeline already owns:

  gate(t) = (emission[t] == 0) AND (direct_px[t] >= W*H / 4096)

where direct_px[t] counts the pixels (one jittered primary ray per
pixel at the recovery resolution, fixed key) whose FIRST camera-ray hit
is triangle t — pure scene geometry + camera, no labels anywhere.
Rationale for the two terms:
  * an emissive triangle's pixels are emission-dominated (emission adds
    to radiance at bounce 0, path_trace.cu:122-124, and the Cornell
    light's L_o ~ 30 vs Kd <= 1), so the pixel loss carries ~no Kd
    signal for it;
  * a face needs a non-negligible share of direct pixels for the
    pixel-loss gradient to beat the MC noise; 1/4096 of the image
    (16 px at 256^2) is well inside the measured gap — on the
    Cornell+cube scenes every camera-hidden cube face gets EXACTLY 0
    direct pixels while every visible face gets >= 118 at 256^2, so any
    threshold in (0, 118] yields the same gate there.

The hybrid estimator takes the pixel-refined recovery on gated
triangles and the GCN prediction elsewhere.  Ground-truth labels are
read ONLY in the final error REPORT (phase 3), never to choose the
gate or assemble the estimator.

Usage:
    python scripts/gate_recover100.py --tag recover100_256
reads  runs/<tag>/recovered.npy  (pixel-refined, from run_recover100.py)
       runs/<tag>/gcn_init.npy   (GCN warm-start predictions)
       artifacts/exp100/metrics.json [tag]["config"] for the resolution
writes runs/<tag>/recovered_gated.npy
       artifacts/exp100/recovered_gated_<res>.npy
       gate + gated-error fields merged into the tag's metrics block.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GATE_CPU", "0") == "1":
    # Run the (tiny) gate compute on the CPU backend so this script can
    # run while the TPU is busy with a recovery/bench job.  Needs BOTH
    # the env and the config update (the sitecustomize plugin re-forces
    # 'axon,cpu' — CLAUDE.md gotcha).
    import jax

    jax.config.update("jax_platforms", "cpu")

REF = "/root/reference"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts", "exp100")


def direct_pixel_counts(scene, res: int) -> np.ndarray:
    """(nT,) pixels whose first camera-ray hit is each triangle — one
    jittered primary ray per pixel at the recovery resolution."""
    import jax
    import jax.numpy as jnp

    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.ops.intersect import intersect_fast
    from inverse_path_tracer_tpu.render.forward import camera_rays

    cfg = RenderConfig(width=res, height=res, spp=1, max_bounces=1)
    idx = jnp.arange(res * res, dtype=jnp.int32)
    p, d = camera_rays(scene, cfg, jax.random.PRNGKey(7), idx)
    isect = intersect_fast(scene, p, d, cfg.min_dot, cfg.epsilon)
    tri = np.asarray(jnp.where(isect.hit, isect.tri, -1))
    return np.bincount(tri[tri >= 0], minlength=scene.n_tri)


def compute_gate(scene, res: int):
    """(gate_bool (nT,), direct_px (nT,), threshold) — label-free."""
    direct_px = direct_pixel_counts(scene, res)
    threshold = max(1, (res * res) // 4096)
    emissive = np.asarray(scene.emission).max(axis=1) > 0
    gate = (~emissive) & (direct_px >= threshold)
    return gate, direct_px, threshold


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="recover100")
    args = ap.parse_args()
    run = os.path.join(ROOT, "runs", args.tag)
    mpath = os.path.join(ART, "metrics.json")
    with open(mpath) as f:
        all_m = json.load(f)
    if args.tag not in all_m:
        sys.exit(f"no '{args.tag}' block in {mpath}; run run_recover100.py first")
    metrics = all_m[args.tag]
    res = int(metrics["config"]["res"])

    from inverse_path_tracer_tpu.scene.build import load_scene

    scene = load_scene(os.path.join(REF, "scenes/0.txt"), asset_root=REF)

    # --- Phase 1: the label-free gate ---
    gate, direct_px, threshold = compute_gate(scene, res)
    gate_tris = [int(t) for t in np.nonzero(gate)[0]]
    print(f"gate ({gate.sum()}/{scene.n_tri} tris, direct_px >= {threshold}, "
          f"non-emissive): {gate_tris}", file=sys.stderr)

    # --- Phase 2: assemble the hybrid estimator (still label-free) ---
    refined = np.load(os.path.join(run, "recovered.npy"))  # (S, nT, 3)
    gcn = np.load(os.path.join(run, "gcn_init.npy"))  # (S, nT, 3)
    gated = np.where(gate[None, :, None], refined, gcn)
    np.save(os.path.join(run, "recovered_gated.npy"), gated)
    np.save(os.path.join(ART, f"recovered_gated_{res}.npy"), gated)

    # --- Phase 3: error REPORT (the only place labels are read) ---
    n = refined.shape[0]
    labels = np.stack([
        np.asarray(load_scene(os.path.join(REF, "scenes", f"{i}.txt"),
                              asset_root=REF).diffuse)
        for i in range(n)
    ])
    err = np.abs(gated - labels)
    # Recompute the ungated per-face diagnostics from the run artifacts
    # too, so every per-face key in the block traces to this script.
    metrics["per_face_cube_err"] = [
        round(float(v), 4)
        for v in np.abs(refined - labels)[:, 18:, :].mean(axis=(0, 2))
    ]
    metrics["gcn_init_per_face_cube_err"] = [
        round(float(v), 4)
        for v in np.abs(gcn - labels)[:, 18:, :].mean(axis=(0, 2))
    ]
    metrics["observability"] = {
        "direct_px": [int(c) for c in direct_px],
        "threshold_px": threshold,
        "rule": "non-emissive AND direct_px >= W*H/4096 (label-free; "
                "see scripts/gate_recover100.py)",
    }
    metrics["observability_gate_tris"] = gate_tris
    metrics["gated_mean_kd_err"] = float(err.mean())
    metrics["gated_mean_kd_err_cube"] = float(err[:, 18:, :].mean())
    metrics["gated_per_face_cube_err"] = [
        round(float(v), 4) for v in err[:, 18:, :].mean(axis=(0, 2))
    ]
    all_m[args.tag] = metrics
    with open(mpath, "w") as f:
        json.dump(all_m, f, indent=1)
    print(json.dumps({k: metrics[k] for k in
                      ("observability_gate_tris", "gated_mean_kd_err",
                       "gated_mean_kd_err_cube", "gated_per_face_cube_err")}),
          flush=True)


if __name__ == "__main__":
    main()
