"""Micro-decomposition of the staged wavefront's inter-stage permute
(the ~0.6 s/render sort+gather floor from the r04 campaign,
BASELINE.md): what does one stage transition actually cost, and does a
multi-operand co-sort (permute the 24-row carry INSIDE the sort instead
of sort-then-gather) beat the shipped form?

    timeout 900 python scripts/probe_permute.py

Shapes: carry (24, 65536) f32, binned keys in [0, 16384) — the
production stage-transition workload (tile 65536, CARRY_ROWS 24).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, iters=10):
    jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    dt = min(t for t in times if t >= 0.5 * med)
    log(f"{label}: best {dt*1e3:.3f} ms (med {med*1e3:.3f})")
    return round(dt * 1e3, 3)


def main():
    n, rows = 65536, 24
    kk = jax.random.PRNGKey(0)
    carry = jax.random.uniform(kk, (rows, n), jnp.float32)
    key = jax.random.randint(jax.random.fold_in(kk, 1), (n,), 0, 16384)
    iota = jnp.arange(n, dtype=jnp.int32)
    jax.block_until_ready(jnp.dot(jnp.eye(8), jnp.eye(8)))  # tunnel warm
    out = {}

    @jax.jit
    def shipped(carry, key):
        _, order = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        return carry[:, order], order

    @jax.jit
    def sort_only(key):
        return jax.lax.sort((key, iota), num_keys=1, is_stable=True)[1]

    order = jax.block_until_ready(sort_only(key))

    @jax.jit
    def gather_only(carry, order):
        return carry[:, order]

    @jax.jit
    def cosort(carry, key):
        ops = (key, iota) + tuple(carry[i] for i in range(rows))
        s = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return jnp.stack(s[2:], axis=0), s[1]

    @jax.jit
    def gather_rowmajor(carry, order):
        return carry.T[order].T

    @jax.jit
    def scatter_set(carry, order):
        return jnp.zeros((3, n), jnp.float32).at[:, order].set(carry[:3])

    # equivalence
    a, o1 = jax.block_until_ready(shipped(carry, key))
    b, o2 = jax.block_until_ready(cosort(carry, key))
    assert (jnp.abs(a - b).max() == 0) and (o1 == o2).all()

    out["shipped_sort_gather"] = timeit("shipped_sort_gather",
                                        lambda: shipped(carry, key))
    out["sort_only"] = timeit("sort_only", lambda: sort_only(key))
    out["gather24_only"] = timeit("gather24_only",
                                  lambda: gather_only(carry, order))
    out["cosort26"] = timeit("cosort26", lambda: cosort(carry, key))
    out["gather_rowmajor"] = timeit("gather_rowmajor",
                                    lambda: gather_rowmajor(carry, order))
    out["scatter_set3"] = timeit("scatter_set3",
                                 lambda: scatter_set(carry, order))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
