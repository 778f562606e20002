"""GCN material regressor in pure JAX.

Re-design of the reference's DGL/torch model (ipt.py:28-84): the
transport graphs here are tiny and dense ((nT+1) x nT), so DGL's sparse
message passing `src_mul_edge -> sum` is just a dense matmul
`reduced = A @ H` with A[dst, src] = edge weight — two (n, n) x (n, d)
matmuls per layer, which is exactly what the MXU wants.  No graph
library needed.

Architecture parity (ipt.py:28-67):
  lift: Linear(3 -> 100) + tanh
  3 x MPL(100 -> 100, relu):  h' = relu(concat(h, A @ h) @ W + b)
  out:  Linear(100 -> 3) + sigmoid
  loss: mean L1 (ipt.py:48-50)

Graph construction parity (build_graph ipt.py:69-84):
  * threshold w < P_MIN (1e-3) to 0, then row-normalize over src;
  * drop the eye row from A; node features = eye-row pixel colors;
  * dgl.add_self_loop appends zero-weight self edges — they contribute
    nothing to the weighted sum, so dense A needs no change;
  * the `light` tensor is UNUSED (ipt.py:69 signature takes it, never
    reads it) — kept in the signature for parity.

Init matches torch.nn.Linear defaults (kaiming_uniform(a=sqrt(5)) =>
U(+-1/sqrt(fan_in)) for both weight and bias) so training dynamics are
comparable.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def build_dense_graph(
    w: jnp.ndarray,  # (nT+1, nT) row-normalized log-weights from compress
    pixel: jnp.ndarray,  # (nT+1, nT, 3)
    light: jnp.ndarray = None,  # unused (parity with ipt.py:69)
    p_min: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (A (nT, nT) dense adjacency with A[dst, src] = weight,
          node_feats (nT, 3) = eye-row pixel colors)."""
    w = jnp.where(w < p_min, 0.0, w)
    row = w.sum(axis=-1, keepdims=True)
    w = w / jnp.where(row != 0.0, row, 1.0)
    adj = w[:-1]  # (nT, nT); eye row dropped
    node_feats = pixel[-1]  # (nT, 3)
    return adj, node_feats


def _linear_init(key, fan_in: int, fan_out: int):
    bound = 1.0 / jnp.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return w, b


def init_gcn(
    key: jax.Array, in_feats: int = 3, hidden: int = 100, out_feats: int = 3,
    n_mpl: int = 3,
) -> Params:
    keys = jax.random.split(key, n_mpl + 2)
    params: Params = {}
    params["lift_w"], params["lift_b"] = _linear_init(keys[0], in_feats, hidden)
    for i in range(n_mpl):
        params[f"mpl{i}_w"], params[f"mpl{i}_b"] = _linear_init(
            keys[1 + i], hidden * 2, hidden
        )
    params["out_w"], params["out_b"] = _linear_init(keys[-1], hidden, out_feats)
    return params


def gcn_forward(params: Params, adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(nT, 3) node feats -> (nT, 3) predicted Kd in (0, 1).

    Works batched via vmap over leading scene axes."""
    h = jnp.tanh(x @ params["lift_w"] + params["lift_b"])
    i = 0
    while f"mpl{i}_w" in params:
        reduced = adj @ h  # DGL src_mul_edge+sum == dense matmul
        h = jnp.concatenate([h, reduced], axis=-1)
        h = jax.nn.relu(h @ params[f"mpl{i}_w"] + params[f"mpl{i}_b"])
        i += 1
    return jax.nn.sigmoid(h @ params["out_w"] + params["out_b"])


def gcn_loss(params: Params, adj, x, labels) -> jnp.ndarray:
    """Mean L1 (ipt.py:48-50); batched inputs allowed."""
    preds = gcn_forward(params, adj, x)
    return jnp.abs(preds - labels).mean()


def make_gcn_train_step(optimizer):
    """Jitted full-batch Adam step (ipt.py:115-125)."""

    @jax.jit
    def step(params, opt_state, adj, x, labels):
        loss, grads = jax.value_and_grad(gcn_loss)(params, adj, x, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def train_gcn(
    key: jax.Array,
    adj: jnp.ndarray,  # (S, nT, nT) or (nT, nT)
    x: jnp.ndarray,
    labels: jnp.ndarray,
    epochs: int = 100_000,
    lr: float = 1e-4,
    log_every: int = 1000,
    log_fn=None,
    checkpoint_path: str = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Training loop with the reference schedule (Adam lr 1e-4, 100k
    full-batch epochs, ipt.py:110-111).  Runs in log_every-sized jitted
    scan chunks so the host loop is negligible.

    Checkpoint/resume (SURVEY.md §5): (params, opt_state) saved every
    `checkpoint_every` epochs (rounded to chunk boundaries); resume=True
    restores and continues — training is deterministic given key, so the
    resumed run matches an uninterrupted one."""
    import os

    import optax

    params = init_gcn(key)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    start_epoch = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

        (params, opt_state), start_epoch = load_checkpoint(
            checkpoint_path, (params, opt_state)
        )

    if adj.ndim == 3:
        loss_fn = lambda p: jax.vmap(lambda a, xx, ll: gcn_loss(p, a, xx, ll))(
            adj, x, labels
        ).mean()
    else:
        loss_fn = lambda p: gcn_loss(p, adj, x, labels)

    def one(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda pp, u: pp + u, params, updates)
        return (params, opt_state), loss

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def chunk(params, opt_state, n):
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=n
        )
        return params, opt_state, losses[-1]

    done = start_epoch
    loss = None
    last_ckpt = start_epoch
    while done < epochs:
        n = min(log_every, epochs - done)
        params, opt_state, loss = chunk(params, opt_state, n)
        done += n
        if log_fn is not None:
            log_fn(done, float(loss))
        if (
            checkpoint_path
            and checkpoint_every
            and done - last_ckpt >= checkpoint_every
        ):
            from inverse_path_tracer_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, (params, opt_state), step=done)
            last_ckpt = done
    return params, float(loss) if loss is not None else float("nan")
