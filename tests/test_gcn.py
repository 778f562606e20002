"""GCN model tests: graph construction parity, forward shape/range,
training convergence on a real extracted transport graph."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from inverse_path_tracer_tpu.config import RenderConfig
from inverse_path_tracer_tpu.models.gcn import (
    build_dense_graph,
    gcn_forward,
    gcn_loss,
    init_gcn,
    make_gcn_train_step,
    train_gcn,
)


def test_build_dense_graph_threshold_and_normalize():
    w = jnp.array(
        [
            [0.5, 0.0005, 0.5],  # 0.0005 < P_MIN drops, then renormalize
            [0.0, 0.0, 0.0],
            [0.2, 0.2, 0.6],
            [1.0, 0.0, 0.0],  # eye row
        ]
    )
    pixel = jnp.ones((4, 3, 3)) * 0.25
    adj, feats = build_dense_graph(w, pixel)
    assert adj.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(adj[0]), [0.5, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(adj[1]), 0.0)
    np.testing.assert_allclose(np.asarray(adj[2]), [0.2, 0.2, 0.6], atol=1e-6)
    assert feats.shape == (3, 3)


def test_gcn_forward_shapes_and_range():
    params = init_gcn(jax.random.PRNGKey(0))
    adj = jnp.eye(30) * 0.5
    x = jnp.ones((30, 3)) * 0.3
    out = gcn_forward(params, adj, x)
    assert out.shape == (30, 3)
    assert (np.asarray(out) > 0).all() and (np.asarray(out) < 1).all()


def test_gcn_param_count_matches_reference():
    """lift 3->100, 3 x MPL(200->100), out 100->3 (~81k params,
    SURVEY.md §6 GCN size row)."""
    params = init_gcn(jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in params.values())
    expected = (3 * 100 + 100) + 3 * (200 * 100 + 100) + (100 * 3 + 3)
    assert n == expected == 61003


def test_gcn_trains_on_extracted_graph(cornell_scene):
    """End-to-end: render -> extract graph -> train GCN; loss drops well
    below the 0.25 expected-from-random floor."""
    from inverse_path_tracer_tpu.render.forward import render_image
    from inverse_path_tracer_tpu.render.inverse import extract_graph

    cfg = RenderConfig(width=32, height=32, spp=8, max_bounces=8, tile_size=2048)
    img = render_image(cornell_scene.diffuse, cornell_scene, jax.random.PRNGKey(0), cfg)
    w, pixel, light = jax.jit(extract_graph, static_argnums=(3,))(
        cornell_scene, img, jax.random.PRNGKey(1), cfg
    )
    adj, feats = build_dense_graph(w, pixel, light)
    labels = cornell_scene.diffuse

    params, loss = train_gcn(
        jax.random.PRNGKey(2), adj, feats, labels, epochs=3000, lr=1e-3
    )
    assert loss < 0.08

    preds = gcn_forward(params, adj, feats)
    # The cube Kd (strongly colored) should be recovered to ~0.1.
    err = np.abs(np.asarray(preds[18]) - np.asarray(labels[18]))
    assert err.mean() < 0.15


def test_train_step_decreases_loss():
    key = jax.random.PRNGKey(0)
    params = init_gcn(key)
    opt = optax.adam(1e-3)
    step = make_gcn_train_step(opt)
    adj = jax.random.uniform(jax.random.PRNGKey(1), (8, 8)) * 0.2
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))
    labels = jax.random.uniform(jax.random.PRNGKey(3), (8, 3))
    state = opt.init(params)
    l0 = float(gcn_loss(params, adj, x, labels))
    for _ in range(200):
        params, state, loss = step(params, state, adj, x, labels)
    assert float(loss) < l0
