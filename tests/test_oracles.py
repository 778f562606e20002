"""The reference's committed numeric ground truths as oracles
(artifacts/ORACLES.md; VERDICT r1 missing #2).

- temp.pt: the reference's committed per-triangle diffuse *prediction*
  for the 30-tri Cornell+cube scene; our committed GCN checkpoint must
  beat its error against the true labels by a wide margin.
- mat.npy: an 18x18 row-normalized transport matrix for the Cornell box
  in local coordinates with the mesh.ply triangulation; its values are
  a low-sample artifact (see ORACLES.md) but its structure — shape,
  normalization, zero diagonal, coplanarity zero pattern — is exact and
  our extraction must reproduce all of it.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "exp100")


def _ref_scene_labels(i: int) -> np.ndarray:
    from inverse_path_tracer_tpu.scene.build import load_scene

    return np.asarray(
        load_scene(os.path.join(REF, "scenes", f"{i}.txt"), asset_root=REF).diffuse
    )


def test_gcn_beats_reference_prediction():
    """Our GCN (committed checkpoint, trained at the reference schedule
    on our extracted graphs) predicts Kd at least 10x better than the
    reference's committed prediction tensor temp.pt, scored at temp.pt's
    most favorable scene."""
    import torch

    from inverse_path_tracer_tpu.models.gcn import build_dense_graph, gcn_forward, init_gcn
    from inverse_path_tracer_tpu.utils.checkpoint import load_checkpoint

    temp = torch.load(os.path.join(REF, "temp.pt"), map_location="cpu").numpy()
    assert temp.shape == (30, 3)

    # Reference's committed prediction error, most favorable scene wins.
    # The Cornell rows are scene-independent; only the cube Kd varies.
    ref_errs = [
        float(np.abs(temp - _ref_scene_labels(i)).mean()) for i in range(100)
    ]
    ref_best = min(ref_errs)
    assert ref_best < 0.5  # sanity: temp.pt is in Kd space

    params, _ = load_checkpoint(
        os.path.join(ART, "gcn0_params.npz"), init_gcn(jax.random.PRNGKey(0))
    )
    with np.load(os.path.join(ART, "data.npz")) as d:
        adj, feats = build_dense_graph(
            jnp.asarray(d["w"][0]), jnp.asarray(d["pixel"][0])
        )
        labels = np.asarray(d["labels"][0])
    ours = np.asarray(gcn_forward(params, adj, feats))
    our_err = float(np.abs(ours - labels).mean())
    assert our_err * 10 < ref_best, (
        f"our GCN err {our_err:.5f} vs reference's committed {ref_best:.5f}"
    )


def _mat_npy_scene():
    """Rebuild the exact mat.npy scene: Cornell box in local coords,
    mesh.ply triangulation/face order, light faces 16-17 emissive
    (provenance: artifacts/ORACLES.md)."""
    import tempfile

    from inverse_path_tracer_tpu.scene.build import build_scene
    from inverse_path_tracer_tpu.scene.dsl import ObjectParams

    v = np.array(
        [[-1, -1, -1], [-1, -1, 1], [1, -1, -1], [1, -1, 1],
         [-1, 1, -1], [-1, 1, 1], [1, 1, -1], [1, 1, 1],
         [-0.5, 1, -0.5], [-0.5, 1, 0.5], [0.5, 1, -0.5], [0.5, 1, 0.5]],
        dtype=float,
    )
    f = np.array(
        [[0, 1, 3], [0, 3, 2], [8, 9, 5], [8, 5, 4], [4, 6, 10], [4, 10, 8],
         [9, 11, 7], [9, 7, 5], [6, 7, 11], [6, 11, 10], [5, 7, 3], [5, 3, 1],
         [2, 3, 7], [2, 7, 6], [4, 5, 1], [4, 1, 0], [10, 11, 9], [10, 9, 8]]
    )
    d = tempfile.mkdtemp()
    path = os.path.join(d, "cornell_local.obj")
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for t in f:
            fh.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    obj = ObjectParams(pos=(0, 0, 0), ori=(0, 0, 0), scl=(1, 1, 1),
                       obj_file=path, mtl_file="*Kd 0.5 0.5 0.5*")
    scene = build_scene([obj], asset_root=None)
    em = np.zeros((18, 3), np.float32)
    em[16] = em[17] = 10.0
    area = np.asarray(scene.area)
    eidx = np.array([16, 17], np.int32)
    ep = (area[eidx] / area[eidx].sum()).astype(np.float32)
    return scene._replace(
        emission=jnp.asarray(em),
        emissive_idx=jnp.asarray(eidx),
        emissive_p=jnp.asarray(ep),
        emissive_cdf=jnp.asarray(np.cumsum(ep).astype(np.float32)),
    )


# Coplanar triangle groups of the mat.npy scene: no light transport is
# possible within a group (coplanar emitter/receiver), so both mat.npy
# and any correct extraction must be exactly zero there.
COPLANAR_GROUPS = [
    [0, 1],                                  # floor, y = -1
    [2, 3, 4, 5, 6, 7, 8, 9, 16, 17],        # ceiling ring + light, y = 1
    [10, 11],                                # back wall, z = 1
    [12, 13],                                # right wall, x = 1
    [14, 15],                                # left wall, x = -1
]


def _coplanar_mask() -> np.ndarray:
    m = np.zeros((18, 18), bool)
    for g in COPLANAR_GROUPS:
        for a in g:
            for b in g:
                m[a, b] = True
    return m


def test_mat_npy_structure():
    """The committed artifact itself satisfies the invariants we claim."""
    m = np.load(os.path.join(REF, "mat.npy"))
    assert m.shape == (18, 18)
    assert (m >= 0).all()
    np.testing.assert_allclose(np.diag(m), 0.0, atol=0)
    rows = m.sum(1)
    visited = rows > 0
    np.testing.assert_allclose(rows[visited], 1.0, atol=5e-3)
    assert m[_coplanar_mask()].max() == 0.0


def test_transport_matrix_structure_vs_mat_npy():
    """Our extraction on the reconstructed mat.npy scene reproduces
    every structural invariant of the committed artifact."""
    from inverse_path_tracer_tpu.config import RenderConfig
    from inverse_path_tracer_tpu.models.gcn import build_dense_graph
    from inverse_path_tracer_tpu.render.inverse import extract_graph

    scene = _mat_npy_scene()
    cfg = RenderConfig(width=48, height=48, spp=8, max_bounces=8,
                       tile_size=4608)
    img = jnp.full((48, 48, 3), 0.5)
    w, pixel, _ = extract_graph(scene, img, jax.random.PRNGKey(2), cfg)
    a, _ = build_dense_graph(w, pixel)
    a = np.asarray(a)
    ref = np.load(os.path.join(REF, "mat.npy"))
    assert a.shape == ref.shape
    assert (a >= 0).all()
    np.testing.assert_allclose(np.diag(a), 0.0, atol=0)
    rows = a.sum(1)
    visited = rows > 0
    assert visited.sum() == 18  # camera inside the box sees every wall
    np.testing.assert_allclose(rows[visited], 1.0, atol=5e-3)
    # The geometric content of mat.npy: zero transport within coplanar
    # groups, nonzero across them (for the always-visited pairs).
    assert a[_coplanar_mask()].max() == 0.0
    # Floor receives from both light triangles (the artifact's 240:1
    # split is sampling noise; see ORACLES.md) — ours must see both.
    assert a[0, 16] > 0 and a[0, 17] > 0
