"""Same-process decomposition + A/B sweep of the LARGE-scene transport
extraction (the records-mode inverse path, render/inverse.py
_trace_transport_range_pallas_rec).

The r04 measurement said "sort-dominated" from end-to-end numbers only;
this script breaks the path into its stages and measures candidate
reductions back-to-back in one process (the only trustworthy comparison
on the tunneled v5e, CLAUDE.md):

  stages:   e2e_rec      full records extraction (current shipped path)
            kernel_only  the Pallas records kernel alone (records
                         summed, no reduction)
            reduce_only  _grids_from_edge_records on a captured tile
  micro:    argsort, payload gather, compensated cumsum, searchsorted
            (left+right) on the captured keys/values
  variants: candidate reductions (single searchsorted, sort-method
            searchsorted, multi-operand co-sort) validated against the
            shipped one (max |delta| printed) then timed.

    timeout 1800 python scripts/sweep_vn_extract.py

Knobs: VNX_WIDTH/HEIGHT/SPP (default 128/128/8 — the r04 artifact
config), VNX_BOUNCES (16), VNX_TILE (65536), VNX_BIG=1 adds a
256x256/16spp e2e section (the r04 large config).
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


def timeit(label, fn, iters=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    dt = min(t for t in times if t >= 0.5 * med)
    log(f"{label}: best {dt:.3f}s, all {[round(t, 3) for t in times]}, "
        f"compile {compile_s:.1f}s")
    return {"seconds": round(dt, 4), "spread": [round(t, 4) for t in times],
            "compile_s": round(compile_s, 1)}


def main():
    width = int(os.environ.get("VNX_WIDTH", 128))
    height = int(os.environ.get("VNX_HEIGHT", 128))
    spp = int(os.environ.get("VNX_SPP", 8))
    bounces = int(os.environ.get("VNX_BOUNCES", 16))
    tile = int(os.environ.get("VNX_TILE", 1 << 16))
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_bounces=bounces, tile_size=tile,
                       backend="pallas")
    log(f"devices: {jax.devices()}")
    scene = sphere_scene()
    n_tri = scene.n_tri
    log(f"scene: nT={n_tri}, {width}x{height}/{spp}spp/{bounces}b tile={tile}")

    # Warm the tunnel (CLAUDE.md gotcha) before any large Mosaic compile.
    t0 = time.time()
    jax.block_until_ready(render_samples(
        scene.diffuse, scene, jax.random.PRNGKey(0),
        cfg.with_(width=32, height=32, spp=2, max_bounces=4, tile_size=2048),
    ))
    log(f"warmup: {time.time() - t0:.1f}s")

    from inverse_path_tracer_tpu.render.inverse import (
        _grids_from_edge_records,
        compress_grids,
        trace_transport_range,
    )
    from inverse_path_tracer_tpu.ops.pallas.inverse_kernel import (
        inverse_tile_pallas_rec,
    )
    from inverse_path_tracer_tpu.ops.pallas.render_kernel import kernel_perm
    from inverse_path_tracer_tpu.render.forward import (
        _pallas_block,
        _pallas_keys,
        camera_rays,
    )

    target = jnp.zeros((height, width, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    out = {"config": f"{width}x{height}/{spp}spp/{bounces}b"}

    # --- stage: end-to-end records extraction (shipped path) ---
    @jax.jit
    def e2e(k):
        grids = trace_transport_range(scene, target, k, cfg, jnp.int32(0),
                                      cfg.n_samples)
        return compress_grids(grids, n_tri)

    out["e2e_rec"] = timeit("e2e_rec", lambda: e2e(key))

    # --- stage: kernel only (records summed, no reduction) ---
    count = cfg.n_samples
    tile_n = min(tile, count)
    n_tiles = -(-count // tile_n)
    block = _pallas_block(scene, tile_n, records=True, u_rows=0)
    target_flat = target.reshape(-1, 3)
    perm = kernel_perm(scene, cfg)

    def one_tile_rec(tile_start):
        idx = tile_start + jnp.arange(tile_n, dtype=jnp.int32)
        in_range = idx < cfg.n_samples
        p, d = camera_rays(scene, cfg, jax.random.fold_in(key, 0), idx)
        pix_idx = jnp.clip(idx // cfg.spp, 0, width * height - 1)
        pixel_colors = target_flat[pix_idx]
        rec = inverse_tile_pallas_rec(
            scene, cfg, p.T, d.T, in_range.astype(jnp.float32)[None, :],
            pixel_colors.T, None, block=block, interpret=False,
            orig=idx[None, :], keys=_pallas_keys(key),
        )
        return rec, pixel_colors

    @jax.jit
    def kernel_only(k):
        starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile_n

        def f(carry, s):
            rec, _pix = one_tile_rec(s)
            return carry + rec.sum(), None

        acc, _ = jax.lax.scan(f, jnp.float32(0), starts)
        return acc

    out["kernel_only"] = timeit("kernel_only", lambda: kernel_only(key))
    out["n_tiles"] = n_tiles

    # --- captured records for reduction micro-benches ---
    rec0, pix0 = jax.jit(lambda: one_tile_rec(jnp.int32(0)))()
    rec0, pix0 = jax.block_until_ready((rec0, pix0))

    @jax.jit
    def reduce_only(rec, pix):
        return _grids_from_edge_records(rec, pix, scene, cfg, perm)

    out["reduce_only_per_tile"] = timeit(
        "reduce_only_per_tile", lambda: reduce_only(rec0, pix0))

    # --- micro: the reduction's internal stages on captured keys/vals ---
    def keys_vals(rec, pix):
        """Replicates _grids_from_edge_records up to the sort inputs."""
        b = cfg.max_bounces
        t = rec.shape[1]
        r = rec.reshape(b, 8, t)
        dst_i, src_i = r[:, 0].astype(jnp.int32), r[:, 1].astype(jnp.int32)
        hit, w, ok, nee_w = r[:, 2], r[:, 3], r[:, 4], r[:, 5]
        e_i = r[:, 6].astype(jnp.int32)
        to_g = jnp.concatenate([perm, jnp.asarray([n_tri])]).astype(jnp.int32)
        dst_g = to_g[jnp.clip(dst_i, 0, n_tri)]
        src_g = to_g[jnp.clip(src_i, 0, n_tri - 1)]
        e_g = to_g[jnp.clip(e_i, 0, n_tri - 1)]
        n_bins = (n_tri + 1) * n_tri
        pix_b = jnp.broadcast_to(pix.T[None], (b, 3, t))

        def quant(w_, f0, light, mask):
            wm = jnp.where(mask > 0, w_, 0.0)
            wf = wm * f0
            return jnp.stack([wm, wf, wf * pix_b[:, 0], wf * pix_b[:, 1],
                              wf * pix_b[:, 2], wf * light[:, 0],
                              wf * light[:, 1], wf * light[:, 2], mask],
                             axis=-1)

        zeros3 = jnp.zeros((b, 3, t), jnp.float32)
        k_ind = jnp.where(hit > 0, dst_g * n_tri + src_g, n_bins)
        v_ind = quant(w, 1.0, zeros3, hit)
        light = scene.emission[e_g].transpose(0, 2, 1)
        k_nee = jnp.where(ok > 0, src_g * n_tri + e_g, n_bins)
        v_nee = quant(nee_w, 1.0 / 3.141592653589793, light, ok)
        keys = jnp.concatenate([k_ind.reshape(-1), k_nee.reshape(-1)])
        vals = jnp.concatenate([v_ind.reshape(-1, 9), v_nee.reshape(-1, 9)])
        return keys, vals

    keys_c, vals_c = jax.block_until_ready(jax.jit(keys_vals)(rec0, pix0))
    n_bins = (n_tri + 1) * n_tri
    m = keys_c.shape[0]
    out["records_per_tile"] = m
    log(f"captured: {m} records/tile, {n_bins} bins")

    out["micro_keys_vals"] = timeit(
        "micro_keys_vals", lambda: jax.jit(keys_vals)(rec0, pix0))
    out["micro_argsort"] = timeit(
        "micro_argsort", lambda: jnp.argsort(keys_c))
    order_c = jax.block_until_ready(jnp.argsort(keys_c))
    out["micro_gather_vals"] = timeit(
        "micro_gather_vals", lambda: vals_c[order_c])
    k2_c = jax.block_until_ready(keys_c[order_c])
    v2_c = jax.block_until_ready(vals_c[order_c])

    @jax.jit
    def comp_cumsum(v2):
        c_hi = jnp.cumsum(v2, axis=0)
        z = jnp.zeros((1, 9), jnp.float32)
        d = jnp.diff(c_hi, axis=0, prepend=z)
        c_lo = jnp.cumsum(v2 - d, axis=0)
        return jnp.concatenate([z, c_hi], 0), jnp.concatenate([z, c_lo], 0)

    out["micro_cumsum"] = timeit("micro_cumsum", lambda: comp_cumsum(v2_c))
    bins = jnp.arange(n_bins, dtype=keys_c.dtype)

    out["micro_searchsorted_2x"] = timeit(
        "micro_searchsorted_2x",
        lambda: (jnp.searchsorted(k2_c, bins, side="left"),
                 jnp.searchsorted(k2_c, bins, side="right")))
    out["micro_searchsorted_right_only"] = timeit(
        "micro_searchsorted_right_only",
        lambda: jnp.searchsorted(k2_c, bins, side="right"))
    out["micro_searchsorted_sortmethod"] = timeit(
        "micro_searchsorted_sortmethod",
        lambda: jnp.searchsorted(k2_c, bins, side="right", method="sort"))

    # --- candidate full reductions, validated then timed ---
    ref_dense = jax.block_until_ready(reduce_only(rec0, pix0))

    def reduce_v2(rec, pix):
        """left = [0] + right[:-1] (bins are the complete range) — one
        searchsorted instead of two."""
        keys, vals = keys_vals(rec, pix)
        order = jnp.argsort(keys)
        k2, v2 = keys[order], vals[order]
        c_hi, c_lo = comp_cumsum(v2)
        right = jnp.searchsorted(k2, bins, side="right")
        left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
        return (c_hi[right] - c_hi[left]) + (c_lo[right] - c_lo[left])

    def reduce_v3(rec, pix):
        """v2 + searchsorted(method='sort') — no gather-based binary
        search at all."""
        keys, vals = keys_vals(rec, pix)
        order = jnp.argsort(keys)
        k2, v2 = keys[order], vals[order]
        c_hi, c_lo = comp_cumsum(v2)
        right = jnp.searchsorted(k2, bins, side="right", method="sort")
        left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
        return (c_hi[right] - c_hi[left]) + (c_lo[right] - c_lo[left])

    def reduce_v4(rec, pix):
        """Multi-operand lax.sort co-sorts the 9 payload columns with
        the keys (no argsort + row gather)."""
        keys, vals = keys_vals(rec, pix)
        ops = (keys,) + tuple(vals[:, i] for i in range(9))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        k2 = sorted_ops[0]
        v2 = jnp.stack(sorted_ops[1:], axis=-1)
        c_hi, c_lo = comp_cumsum(v2)
        right = jnp.searchsorted(k2, bins, side="right")
        left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
        return (c_hi[right] - c_hi[left]) + (c_lo[right] - c_lo[left])

    for name, fn in (("reduce_v2_1xsearch", reduce_v2),
                     ("reduce_v3_sortmethod", reduce_v3),
                     ("reduce_v4_cosort", reduce_v4)):
        got = jax.block_until_ready(jax.jit(fn)(rec0, pix0))
        delta = float(jnp.max(jnp.abs(got - ref_dense)))
        rel = delta / (float(jnp.max(jnp.abs(ref_dense))) + 1e-30)
        log(f"{name}: max|delta| {delta:.3e} (rel {rel:.1e})")
        out[name] = timeit(name, lambda fn=fn: jax.jit(fn)(rec0, pix0))
        out[name]["max_delta_rel"] = rel

    # --- oracle edge_update: shipped single-matmul vs the r04 k-loop
    # (same-process A/B on captured lane data; VERDICT r4 task 5) ---
    from inverse_path_tracer_tpu.render.inverse import (
        TransportGrids,
        _edge_update,
        _zero_grids,
    )

    n_lanes = 16384
    kk = jax.random.PRNGKey(5)
    dst_l = jax.random.randint(kk, (n_lanes,), 0, n_tri + 1)
    src_l = jax.random.randint(jax.random.fold_in(kk, 1), (n_lanes,), 0, n_tri)
    w_l = jax.random.uniform(jax.random.fold_in(kk, 2), (n_lanes,))
    pix_l = jax.random.uniform(jax.random.fold_in(kk, 3), (n_lanes, 3))
    li_l = jnp.zeros((n_lanes, 3))
    fa_l = jnp.ones((n_lanes, 2))
    ma_l = w_l > 0.1
    g0 = _zero_grids(n_tri, jnp.float32(0.0))

    def edge_update_loop16(grids, n_tri_, dst, src, w, pixel, light,
                           factors, mask):
        """The r04 implementation: 16 thin per-k matmuls."""
        mf = mask.astype(w.dtype)
        dst_oh = (dst[:, None] == jnp.arange(n_tri_ + 1)[None, :]).astype(w.dtype)
        dst_oh = dst_oh * mf[:, None]
        src_oh = (src[:, None] == jnp.arange(n_tri_)[None, :]).astype(w.dtype)
        w_m = w * mf
        wf = w_m[:, None] * factors
        vals = jnp.concatenate(
            [w_m[:, None], wf, wf[:, 0:1] * pixel, wf[:, 1:2] * pixel,
             wf[:, 0:1] * light, wf[:, 1:2] * light, mf[:, None]], axis=1)
        g = jnp.stack(
            [dst_oh.T @ (src_oh * vals[:, k: k + 1]) for k in range(16)],
            axis=-1,
        ).reshape((n_tri_ + 1) * n_tri_, 16)
        return TransportGrids(
            w_sum=grids.w_sum + g[:, 0],
            factors_sum=grids.factors_sum + g[:, 1:3],
            pixel_sum=grids.pixel_sum + g[:, 3:9].reshape(-1, 2, 3),
            light_sum=grids.light_sum + g[:, 9:15].reshape(-1, 2, 3),
            count=grids.count + g[:, 15],
        )

    args_eu = (g0, dst_l, src_l, w_l, pix_l, li_l, fa_l, ma_l)
    # n_tri is a static shape parameter — close over it (tracing it
    # would hit jnp.arange with an abstract stop).
    f_new = jax.jit(lambda g, *a: _edge_update(g, n_tri, *a))
    f_old = jax.jit(lambda g, *a: edge_update_loop16(g, n_tri, *a))
    a_new = jax.block_until_ready(f_new(*args_eu))
    a_old = jax.block_until_ready(f_old(*args_eu))
    d = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a_new, a_old)
    log(f"edge_update old-vs-new max|delta|: {d}")
    out["oracle_edge_update_new"] = timeit(
        "oracle_edge_update_new", lambda: f_new(*args_eu), iters=5)
    out["oracle_edge_update_old16"] = timeit(
        "oracle_edge_update_old16", lambda: f_old(*args_eu), iters=5)

    # --- optional: the r04 large config end-to-end ---
    if os.environ.get("VNX_BIG", "0") == "1":
        big = cfg.with_(width=256, height=256, spp=16)
        tgt = jnp.zeros((256, 256, 3), jnp.float32)

        @jax.jit
        def e2e_big(k):
            grids = trace_transport_range(scene, tgt, k, big, jnp.int32(0),
                                          big.n_samples)
            return compress_grids(grids, n_tri)

        out["e2e_rec_256"] = timeit("e2e_rec_256", lambda: e2e_big(key),
                                    iters=2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
