"""Feasibility probe for per-lane gather-driven traversal (VERDICT r4
next-item 3): can Mosaic express a PER-LANE row gather from a VMEM
table without the one-hot matmul emulation (whose MXU cost equals a
full dense sweep — why block-wide culling was the only shipped option)?

Finding encoded here: jax 0.9 Mosaic lowers `jnp.take_along_axis` to
`tpu.dynamic_gather` ONLY when indices.shape == operand.shape and mode
is fill_or_drop/promise_in_bounds (lowering.py _gather_lowering_rule
:2493-2524) — i.e. one call does out[i,l] = tab[idx[i,l], l] for the
WHOLE (S, B) block, with independent per-(row,lane) indices, along the
sublane (axis 0) or lane (axis 1) dimension.  This probe measures that
primitive's throughput at traversal-realistic sizes against the
one-hot-matmul emulation and a dense VPU sweep anchor.

    timeout 1800 python scripts/probe_gather.py
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_case(name, build, run_args, iters=20):
    """Compile (the real question) then time the kernel."""
    out = {"name": name}
    try:
        fn = jax.jit(build())
        t0 = time.time()
        r = jax.block_until_ready(fn(*run_args))
        out["compile_s"] = round(time.time() - t0, 1)
        times = []
        for _ in range(iters):
            t0 = time.time()
            r = jax.block_until_ready(fn(*run_args))
            times.append(time.time() - t0)
        out["best_s"] = round(min(times), 6)
        out["ok"] = True
        out["checksum"] = float(jnp.sum(r))
    except Exception as e:  # noqa: BLE001
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {str(e)[:400]}"
        log(traceback.format_exc()[-1500:])
    log(name, out)
    return out


REPS = 64  # gathers per kernel call (amortize launch overhead)


def gather_case(s, b, axis):
    """take_along_axis with full-shape indices -> tpu.dynamic_gather.
    Indices vary per LANE (constant down each column) — the traversal
    pattern, where each lane fetches its own triangle's quantities."""
    tab = (jnp.arange(s * b, dtype=jnp.float32).reshape(s, b) % 977.0)
    base = (jax.lax.broadcasted_iota(jnp.int32, (s, b), 1) * 37)
    idx = base % (s if axis == 0 else b)

    def build():
        def kernel(tab_ref, idx_ref, o_ref):
            t = tab_ref[:]
            ix = idx_ref[:]
            lim = s if axis == 0 else b

            def body(i, acc):
                g = jnp.take_along_axis(
                    t, (ix + i) % lim, axis=axis, mode="promise_in_bounds"
                )
                return acc + g

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((s, b), jnp.float32)
            )

        return lambda t, ix: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s, b), jnp.float32),
        )(t, ix)

    return build, (tab, idx)


def onehot_case(s, b):
    """One-hot matmul emulation (known-cost baseline: touches all S
    rows on the MXU/VPU per gathered row)."""
    tab = (jnp.arange(s * b, dtype=jnp.float32).reshape(s, b) % 977.0)
    idx = (jnp.arange(b, dtype=jnp.int32)[None, :] * 37) % s

    def build():
        def kernel(tab_ref, idx_ref, o_ref):
            t = tab_ref[:]
            ix = idx_ref[:]
            iota = jax.lax.broadcasted_iota(jnp.int32, (s, b), 0)

            def body(i, acc):
                oh = (iota == (ix + i) % s).astype(jnp.float32)  # (S, B)
                g = jnp.sum(t * oh, axis=0, keepdims=True)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((1, b), jnp.float32)
            )

        return lambda t, ix: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        )(t, ix)

    return build, (tab, idx)


def dense_case(s, b):
    """Dense-sweep cost anchor: one 2-op VPU pass over all S rows."""
    tab = (jnp.arange(s * b, dtype=jnp.float32).reshape(s, b) % 977.0)
    idx = (jnp.arange(b, dtype=jnp.int32)[None, :] * 37) % s

    def build():
        def kernel(tab_ref, idx_ref, o_ref):
            t = tab_ref[:]

            def body(i, acc):
                fi = i.astype(jnp.float32)
                return acc + jnp.sum(t * (t + fi), axis=0, keepdims=True)

            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((1, b), jnp.float32)
            )

        return lambda t, ix: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        )(t, ix)

    return build, (tab, idx)


def main():
    log(f"devices: {jax.devices()}")
    # Warm the tunnel with a trivial compile first (CLAUDE.md gotcha).
    jax.block_until_ready(jnp.dot(jnp.eye(8), jnp.eye(8)))

    results = []
    for s, b in ((1536, 512), (128, 512)):
        bld, args = gather_case(s, b, 0)
        results.append(try_case(f"dyngather_sublane_{s}x{b}", bld, args))
        bld, args = gather_case(s, b, 1)
        results.append(try_case(f"dyngather_lane_{s}x{b}", bld, args))
    # The traversal-shaped case: a (Q, Tp) quantities-x-triangles table,
    # each of Tp lane-columns gathering its own triangle's Q rows via a
    # lane-axis gather.  One call serves Tp lanes x Q quantities.
    for s, b in ((16, 1536), (16, 4096), (32, 1536)):
        bld, args = gather_case(s, b, 1)
        results.append(try_case(f"dyngather_lane_{s}x{b}", bld, args))
    for s, b in ((1536, 512),):
        bld, args = onehot_case(s, b)
        results.append(try_case(f"onehot_reduce_{s}x{b}", bld, args))
        bld, args = dense_case(s, b)
        results.append(try_case(f"dense_2op_sweep_{s}x{b}", bld, args))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
