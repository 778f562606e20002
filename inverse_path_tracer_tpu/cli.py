"""Command-line interface.

The reference's entry points are two python scripts with commented-out
code paths (ipt.py:86-144).  Here each capability is a subcommand:

  render        forward-render a scene DSL file to PNG
  generate      write n scenes + render their PNGs (dataset generation)
  extract-graph transport-graph extraction -> npz
  train-gcn     train the GCN material regressor on extracted graphs
  recover       direct gradient-based material recovery
  bench         the rays/sec benchmark (same as repo-root bench.py)

Run: python -m inverse_path_tracer_tpu.cli <subcommand> -h
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _cfg_from_args(args):
    from inverse_path_tracer_tpu.config import RenderConfig

    return RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_bounces=args.bounces,
        tile_size=args.tile,
        p_rr=args.p_rr,
        reference_quirks=not args.no_quirks,
        backend=args.backend,
        wavefront=args.wavefront,
        rng=args.rng,
        grad_mode=args.grad_mode,
        intersect=args.intersect,
        stage_bounces=args.stage_bounces,
        cluster_k=getattr(args, "cluster_k", 0),
        pair_sweep=getattr(args, "pair_sweep", "union"),
        bin_cells=getattr(args, "bin_cells", 2),
        stage_loop=getattr(args, "stage_loop", "fori"),
        tri_order=getattr(args, "tri_order", "morton"),
    )


def _add_dist_args(p: argparse.ArgumentParser):
    """Multi-host flags (SURVEY.md §2.3): every host runs the same
    command with its own --process-id; jax.distributed wires them and
    the 'rays' mesh axis spans all hosts' devices."""
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (enables multi-host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _maybe_distributed(args):
    if getattr(args, "coordinator", None):
        from inverse_path_tracer_tpu.parallel.multihost import init_distributed

        info = init_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
        print(f"multihost: {info}", flush=True)


def _add_render_args(p: argparse.ArgumentParser, width=512, height=512, spp=64):
    p.add_argument("--width", type=int, default=width)
    p.add_argument("--height", type=int, default=height)
    p.add_argument("--spp", type=int, default=spp)
    p.add_argument("--bounces", type=int, default=16)
    p.add_argument("--tile", type=int, default=1 << 16)
    p.add_argument("--p-rr", type=float, default=0.9)
    p.add_argument("--no-quirks", action="store_true",
                   help="use the physically-corrected estimator")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "xla", "pallas"),
                   help="auto = fused Pallas kernels on TPU, XLA elsewhere")
    p.add_argument("--wavefront", default="auto",
                   choices=("auto", "mega", "staged"),
                   help="Pallas bounce-loop organisation (auto = mega)")
    p.add_argument("--rng", default="auto",
                   choices=("auto", "external", "fused"),
                   help="kernel uniform source (auto = fused hash RNG on TPU)")
    p.add_argument("--grad-mode", dest="grad_mode", default="custom",
                   choices=("custom", "records", "ad"),
                   help="material-gradient strategy (see config.py)")
    p.add_argument("--intersect", default="auto",
                   choices=("auto", "brute", "bvh"),
                   help="XLA-path intersection strategy")
    p.add_argument("--cluster-k", dest="cluster_k", type=int, default=0,
                   help="cluster width for the chunked sweep (0 = default)")
    p.add_argument("--pair-sweep", dest="pair_sweep", default="union",
                   choices=["union", "split"])
    p.add_argument("--bin-cells", dest="bin_cells", type=int, default=2,
                   help="origin-binning cells per axis (staged wavefront)")
    p.add_argument("--stage-bounces", dest="stage_bounces", type=int, default=4,
                   help="bounces per compaction stage (wavefront=staged)")
    p.add_argument("--stage-loop", dest="stage_loop", default="fori",
                   choices=("fori", "while"),
                   help="stage-kernel bounce loop shape (see config.py)")
    p.add_argument("--tri-order", dest="tri_order", default="morton",
                   choices=("morton", "file"),
                   help="kernel-internal triangle order for clustered scenes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--asset-root", default="/root/reference")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")


def _maybe_cpu(args):
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    _maybe_distributed(args)


def cmd_render(args):
    _maybe_cpu(args)
    import jax
    from inverse_path_tracer_tpu.render.forward import render_to_png
    from inverse_path_tracer_tpu.scene.build import load_scene
    from inverse_path_tracer_tpu.utils.profiling import profile_trace

    scene = load_scene(args.scene, asset_root=args.asset_root)
    cfg = _cfg_from_args(args)
    with profile_trace(args.profile):
        render_to_png(
            scene.diffuse, scene, jax.random.PRNGKey(args.seed), cfg, args.out
        )
    print(f"wrote {args.out} ({cfg.width}x{cfg.height}, {cfg.spp} spp)")
    if args.profile:
        print(f"trace -> {args.profile} (view: tensorboard --logdir {args.profile})")


def cmd_generate(args):
    _maybe_cpu(args)
    from inverse_path_tracer_tpu.data.pipeline import generate_files

    cfg = _cfg_from_args(args)
    generate_files(
        args.n,
        cfg,
        scenes_dir=args.scenes_dir,
        imgs_dir=args.imgs_dir,
        asset_root=args.asset_root,
        seed=args.seed,
    )
    print(f"wrote {args.n} scenes to {args.scenes_dir}/ and renders to {args.imgs_dir}/")


def cmd_extract_graph(args):
    _maybe_cpu(args)
    from inverse_path_tracer_tpu.data.pipeline import generate_data

    cfg = _cfg_from_args(args)
    w, pixel, light, labels = generate_data(
        args.scene, args.image, cfg, asset_root=args.asset_root
    )
    np.savez(args.out, w=w, pixel=pixel, light=light, labels=labels)
    print(f"wrote {args.out}: w{w.shape} pixel{pixel.shape} labels{labels.shape}")


def cmd_train_gcn(args):
    _maybe_cpu(args)
    import jax
    import jax.numpy as jnp
    from inverse_path_tracer_tpu.models.gcn import build_dense_graph, train_gcn, gcn_forward
    from inverse_path_tracer_tpu.utils.checkpoint import save_checkpoint
    from inverse_path_tracer_tpu.utils.metrics import MetricsLogger

    adjs, feats, labels = [], [], []
    for path in args.graphs:
        with np.load(path) as d:
            a, f = build_dense_graph(jnp.asarray(d["w"]), jnp.asarray(d["pixel"]))
            adjs.append(a)
            feats.append(f)
            labels.append(jnp.asarray(d["labels"]))
    adj = jnp.stack(adjs) if len(adjs) > 1 else adjs[0]
    x = jnp.stack(feats) if len(feats) > 1 else feats[0]
    y = jnp.stack(labels) if len(labels) > 1 else labels[0]

    logger = MetricsLogger(args.log)
    params, loss = train_gcn(
        jax.random.PRNGKey(args.seed),
        adj,
        x,
        y,
        epochs=args.epochs,
        lr=args.lr,
        log_every=args.log_every,
        log_fn=lambda s, l: logger.log(step=s, loss=l),
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    save_checkpoint(args.out, params, step=args.epochs, final_loss=loss)
    print(f"final L1 loss {loss:.5f}; checkpoint -> {args.out}")


def cmd_recover(args):
    _maybe_cpu(args)
    import jax
    from inverse_path_tracer_tpu.data.pipeline import load_image01, render_with_materials
    from inverse_path_tracer_tpu.models.recover import recover_materials
    from inverse_path_tracer_tpu.scene.build import load_scene
    from inverse_path_tracer_tpu.utils.metrics import MetricsLogger, psnr

    scene = load_scene(args.scene, asset_root=args.asset_root)
    cfg = _cfg_from_args(args)
    target = load_image01(args.image)
    mesh = None
    if args.shard:
        from inverse_path_tracer_tpu.parallel.shard import make_mesh

        mesh = make_mesh()
    logger = MetricsLogger(args.log)
    mats, losses = recover_materials(
        scene,
        target,
        cfg,
        steps=args.steps,
        lr=args.lr,
        key=jax.random.PRNGKey(args.seed),
        mesh=mesh,
        log_fn=lambda s, l: logger.log(step=s, loss=l)
        if s % args.log_every == 0
        else None,
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    err = np.abs(np.asarray(mats) - np.asarray(scene.diffuse))
    print(f"recovered materials: mean |Kd err| vs scene labels = {err.mean():.4f}")
    np.save(args.out, np.asarray(mats))
    if args.render_out:
        render_with_materials(
            args.scene, args.render_out, mats, cfg, asset_root=args.asset_root
        )
        print(f"re-rendered with recovered materials -> {args.render_out}")


def cmd_make_dataset(args):
    """Extract transport graphs for scenes 0..n-1 into one npz cache (the
    analogue of the reference's torch.save(data, 'data.pt'), ipt.py:98)."""
    _maybe_cpu(args)
    from inverse_path_tracer_tpu.data.pipeline import generate_data

    cfg = _cfg_from_args(args)
    ws, pixels, lights, labels = [], [], [], []
    for i in range(args.n):
        w, pixel, light, lbl = generate_data(
            os.path.join(args.scenes_dir, f"{i}.txt"),
            os.path.join(args.imgs_dir, f"{i}.png"),
            cfg,
            asset_root=args.asset_root,
        )
        ws.append(w)
        pixels.append(pixel)
        lights.append(light)
        labels.append(lbl)
        print(f"scene {i}: graph ok", flush=True)
    np.savez(
        args.out,
        w=np.stack(ws),
        pixel=np.stack(pixels),
        light=np.stack(lights),
        labels=np.stack(labels),
    )
    print(f"wrote {args.out} ({args.n} scenes)")


def cmd_recover_batch(args):
    """Batched gradient recovery over scenes 0..n-1 (BASELINE configs
    #4/#5): one shared geometry, per-scene Kd."""
    _maybe_cpu(args)
    import jax
    import jax.numpy as jnp

    from inverse_path_tracer_tpu.data.pipeline import load_image01
    from inverse_path_tracer_tpu.models.recover import recover_materials_batched
    from inverse_path_tracer_tpu.scene.build import load_scene
    from inverse_path_tracer_tpu.utils.metrics import MetricsLogger

    cfg = _cfg_from_args(args)
    scene = load_scene(
        os.path.join(args.scenes_dir, "0.txt"), asset_root=args.asset_root
    )
    targets = jnp.stack(
        [load_image01(os.path.join(args.imgs_dir, f"{i}.png")) for i in range(args.n)]
    )
    # Per-scene true labels for the error report.
    labels = np.stack(
        [
            np.asarray(
                load_scene(
                    os.path.join(args.scenes_dir, f"{i}.txt"),
                    asset_root=args.asset_root,
                ).diffuse
            )
            for i in range(args.n)
        ]
    )
    mesh = None
    if args.shard:
        from inverse_path_tracer_tpu.parallel.shard import make_mesh

        mesh = make_mesh()
    logger = MetricsLogger(args.log)
    mats, losses = recover_materials_batched(
        scene,
        targets,
        cfg,
        steps=args.steps,
        lr=args.lr,
        key=jax.random.PRNGKey(args.seed),
        mesh=mesh,
        log_fn=lambda s, l: logger.log(step=s, loss=l)
        if s % args.log_every == 0
        else None,
    )
    err = np.abs(np.asarray(mats) - labels).mean(axis=(1, 2))
    print(f"mean |Kd err| per scene: {np.round(err, 4).tolist()}")
    print(f"overall: {err.mean():.4f}")
    np.save(args.out, np.asarray(mats))


def _newdir(name: str, remove: bool = True) -> None:
    """rm -rf + mkdir (reference ipt.py:11-15)."""
    import shutil

    if os.path.isdir(name) and remove:
        shutil.rmtree(name)
    os.makedirs(name, exist_ok=True)


def _zipdir(name: str) -> None:
    """Zip a directory tree (reference ipt.py:17-23)."""
    import zipfile

    with zipfile.ZipFile(f"{name}.zip", "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(name):
            for fn in files:
                zf.write(os.path.join(root, fn))


def cmd_evaluate(args):
    """The reference main()'s eval tail (ipt.py:127-140): for each scene,
    copy the ground-truth render to preds/i_true.png, re-render with the
    GCN's predicted materials to preds/i_pred.png, then zip preds/."""
    _maybe_cpu(args)
    import shutil

    import jax
    import jax.numpy as jnp

    from inverse_path_tracer_tpu.data.pipeline import render_with_materials
    from inverse_path_tracer_tpu.models.gcn import build_dense_graph, gcn_forward, init_gcn
    from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint
    from inverse_path_tracer_tpu.utils.metrics import psnr

    cfg = _cfg_from_args(args)
    params, _ = load_checkpoint(args.params, init_gcn(jax.random.PRNGKey(0)))
    _newdir(args.out_dir)
    for i, graph_path in enumerate(args.graphs):
        with np.load(graph_path) as d:
            adj, feats = build_dense_graph(jnp.asarray(d["w"]), jnp.asarray(d["pixel"]))
        preds = gcn_forward(params, adj, feats)
        scenefile = os.path.join(args.scenes_dir, f"{i}.txt")
        true_png = os.path.join(args.imgs_dir, f"{i}.png")
        shutil.copy(true_png, os.path.join(args.out_dir, f"{i}_true.png"))
        pred_png = os.path.join(args.out_dir, f"{i}_pred.png")
        render_with_materials(scenefile, pred_png, preds, cfg, asset_root=args.asset_root)
        from PIL import Image

        a = np.asarray(Image.open(true_png).convert("RGB"), dtype=np.float32) / 255
        b = np.asarray(Image.open(pred_png).convert("RGB"), dtype=np.float32) / 255
        print(f"scene {i}: PSNR(true, pred) = {psnr(a, b):.2f} dB")
    _zipdir(args.out_dir)
    print(f"wrote {args.out_dir}/ and {args.out_dir}.zip")


def cmd_graph_viz(args):
    """Transport-graph visualization (parity with the reference's
    committed mesh.ply / lines.ply Open3D artifacts): extract the graph
    and write a colored scene mesh + a colored edge line-set."""
    _maybe_cpu(args)
    import jax

    from inverse_path_tracer_tpu.data.pipeline import load_image01
    from inverse_path_tracer_tpu.render.inverse import extract_graph
    from inverse_path_tracer_tpu.scene.build import load_scene
    from inverse_path_tracer_tpu.utils.plyviz import (
        write_graph_ply,
        write_mesh_ply,
    )

    cfg = _cfg_from_args(args)
    scene = load_scene(args.scene, asset_root=args.asset_root)
    target = load_image01(args.image)
    w, _pixel, _light = extract_graph(
        scene, target, jax.random.PRNGKey(args.seed), cfg
    )
    os.makedirs(args.out_dir, exist_ok=True)
    mesh_path = os.path.join(args.out_dir, "mesh.ply")
    lines_path = os.path.join(args.out_dir, "lines.ply")
    write_mesh_ply(scene, scene.diffuse, mesh_path)
    n_edges = write_graph_ply(scene, np.asarray(w), lines_path,
                              p_min=args.p_min)
    print(f"wrote {mesh_path} ({scene.n_tri} faces) and {lines_path} "
          f"({n_edges} edges)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="inverse_path_tracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="forward-render a scene to PNG")
    pr.add_argument("scene")
    pr.add_argument("out")
    pr.add_argument("--profile", default=None,
                    help="dump a TensorBoard/XPlane trace to this directory")
    _add_render_args(pr)
    _add_dist_args(pr)
    pr.set_defaults(fn=cmd_render)

    pg = sub.add_parser("generate", help="generate n scenes + renders")
    pg.add_argument("n", type=int)
    pg.add_argument("--scenes-dir", default="scenes")
    pg.add_argument("--imgs-dir", default="imgs")
    _add_render_args(pg, width=500, height=500, spp=100)
    pg.set_defaults(fn=cmd_generate)

    pe = sub.add_parser("extract-graph", help="transport graph -> npz")
    pe.add_argument("scene")
    pe.add_argument("image")
    pe.add_argument("out")
    _add_render_args(pe)
    pe.set_defaults(fn=cmd_extract_graph)

    pgv = sub.add_parser(
        "graph-viz",
        help="transport graph -> colored mesh.ply + lines.ply "
             "(reference artifact parity)",
    )
    pgv.add_argument("scene")
    pgv.add_argument("image")
    pgv.add_argument("out_dir")
    pgv.add_argument("--p-min", type=float, default=1e-3,
                     help="edge weight threshold (reference ipt.py:26)")
    _add_render_args(pgv)
    pgv.set_defaults(fn=cmd_graph_viz)

    pt = sub.add_parser("train-gcn", help="train the GCN regressor")
    pt.add_argument("graphs", nargs="+", help="npz files from extract-graph")
    pt.add_argument("--out", default="gcn_params.npz")
    pt.add_argument("--epochs", type=int, default=100_000)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--log-every", type=int, default=1000)
    pt.add_argument("--log", default=None, help="JSONL metrics path")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--cpu", action="store_true")
    pt.add_argument("--checkpoint", default=None, help="npz checkpoint path")
    pt.add_argument("--checkpoint-every", type=int, default=0)
    pt.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint if it exists")
    pt.set_defaults(fn=cmd_train_gcn)

    pv = sub.add_parser("recover", help="gradient-based material recovery")
    pv.add_argument("scene")
    pv.add_argument("image")
    pv.add_argument("--out", default="recovered_kd.npy")
    pv.add_argument("--render-out", default=None)
    pv.add_argument("--steps", type=int, default=200)
    pv.add_argument("--lr", type=float, default=5e-2)
    pv.add_argument("--shard", action="store_true", help="shard rays over all devices")
    pv.add_argument("--log", default=None)
    pv.add_argument("--log-every", type=int, default=10)
    pv.add_argument("--checkpoint", default=None, help="npz checkpoint path")
    pv.add_argument("--checkpoint-every", type=int, default=0)
    pv.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint if it exists")
    _add_render_args(pv, width=128, height=128, spp=16)
    _add_dist_args(pv)
    pv.set_defaults(fn=cmd_recover)

    pmd = sub.add_parser("make-dataset", help="cache all scene graphs to one npz")
    pmd.add_argument("n", type=int)
    pmd.add_argument("--out", default="data.npz")
    pmd.add_argument("--scenes-dir", default="scenes")
    pmd.add_argument("--imgs-dir", default="imgs")
    _add_render_args(pmd, width=500, height=500, spp=100)
    pmd.set_defaults(fn=cmd_make_dataset)

    prb = sub.add_parser("recover-batch", help="batched recovery over n scenes")
    prb.add_argument("n", type=int)
    prb.add_argument("--scenes-dir", default="scenes")
    prb.add_argument("--imgs-dir", default="imgs")
    prb.add_argument("--out", default="recovered_batch.npy")
    prb.add_argument("--steps", type=int, default=200)
    prb.add_argument("--lr", type=float, default=5e-2)
    prb.add_argument("--shard", action="store_true")
    prb.add_argument("--log", default=None)
    prb.add_argument("--log-every", type=int, default=10)
    _add_render_args(prb, width=256, height=256, spp=64)
    _add_dist_args(prb)
    prb.set_defaults(fn=cmd_recover_batch)

    pe2 = sub.add_parser(
        "evaluate", help="render preds/ (true vs GCN-predicted) and zip"
    )
    pe2.add_argument("params", help="GCN checkpoint from train-gcn")
    pe2.add_argument("graphs", nargs="+", help="npz graphs, one per scene")
    pe2.add_argument("--scenes-dir", default="scenes")
    pe2.add_argument("--imgs-dir", default="imgs")
    pe2.add_argument("--out-dir", default="preds")
    _add_render_args(pe2, width=500, height=500, spp=100)
    pe2.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
