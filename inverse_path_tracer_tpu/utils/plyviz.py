"""Transport-graph / scene-mesh PLY exporters.

Capability parity with the reference's committed Open3D visualization
artifacts (`mesh.ply`, `lines.ply` at the repo root — a 12-vertex /
18-face colored Cornell mesh and an 18-node / 41-edge colored line-set
view of the transport graph; SURVEY.md §1 asset layer).  The reference
has no exporter script in-tree (the artifacts were committed by hand);
here the export is a first-class CLI step (`cli.py graph-viz`).

Files are ASCII PLY 1.0 with the same element/property layout the
reference artifacts use (vertex xyz [+rgb], edge vertex1/vertex2/rgb,
face vertex_indices), loadable by Open3D/meshlab/trimesh.
"""

from __future__ import annotations

import numpy as np


def _write_ply(path: str, header_lines, body_lines) -> None:
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("comment inverse_path_tracer_tpu graph-viz\n")
        for h in header_lines:
            f.write(h + "\n")
        f.write("end_header\n")
        for b in body_lines:
            f.write(b + "\n")


def write_mesh_ply(scene, materials, path: str) -> None:
    """Colored scene mesh (reference mesh.ply layout: deduplicated
    vertices with uchar RGB, faces as index lists).  Vertex colors come
    from the per-triangle diffuse albedo (last triangle touching a
    shared vertex wins, matching how a per-face color bakes to
    vertices)."""
    v = np.asarray(scene.vertices, dtype=np.float64).reshape(-1, 3)
    mats = np.clip(np.asarray(materials, dtype=np.float64), 0.0, 1.0)
    uv, inv = np.unique(v.round(6), axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    col = np.zeros((uv.shape[0], 3))
    for t in range(faces.shape[0]):
        col[faces[t]] = mats[t]
    col8 = (col * 255).astype(np.uint8)

    header = [
        f"element vertex {uv.shape[0]}",
        "property double x",
        "property double y",
        "property double z",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        f"element face {faces.shape[0]}",
        "property list uchar uint vertex_indices",
    ]
    body = [
        f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}"
        for p, c in zip(uv, col8)
    ] + [f"3 {a} {b} {c}" for a, b, c in faces]
    _write_ply(path, header, body)


def write_graph_ply(
    scene, w: np.ndarray, path: str, p_min: float = 1e-3
) -> int:
    """Transport graph as a colored line set (reference lines.ply
    layout: one node per triangle at its centroid, one edge per
    above-threshold transport entry, uchar RGB per edge).

    `w` is the compressed (nT+1, nT) row-normalized weight grid from
    render/inverse.py compress_grids; the eye row (dst == nT) is
    dropped — the reference artifact visualizes triangle-to-triangle
    transport only (18 nodes for the 18-triangle scene).  Edge color
    encodes relative weight: blue (weak) -> red (strong).  Returns the
    edge count."""
    cent = np.asarray(scene.vertices, dtype=np.float64).mean(axis=1)
    n_tri = cent.shape[0]
    wt = np.asarray(w, dtype=np.float64)[:n_tri]
    wt = np.where(wt > p_min, wt, 0.0)  # reference threshold, ipt.py:26,70
    dst, src = np.nonzero(wt)
    vals = wt[dst, src]
    if vals.size:
        t = vals / vals.max()
    else:
        t = vals
    col8 = np.stack(
        [t * 255, np.zeros_like(t), (1.0 - t) * 255], axis=-1
    ).astype(np.uint8)

    header = [
        f"element vertex {n_tri}",
        "property double x",
        "property double y",
        "property double z",
        f"element edge {dst.shape[0]}",
        "property int vertex1",
        "property int vertex2",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
    ]
    body = [f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}" for p in cent] + [
        f"{d} {s} {c[0]} {c[1]} {c[2]}"
        for d, s, c in zip(dst, src, col8)
    ]
    _write_ply(path, header, body)
    return int(dst.shape[0])


def read_ply_counts(path: str) -> dict:
    """Tiny ASCII-PLY header/body checker for tests: returns
    {element: declared_count} and validates the body line count."""
    counts = {}
    with open(path) as f:
        lines = f.read().splitlines()
    assert lines[0] == "ply" and lines[1].startswith("format ascii")
    i = 2
    while lines[i] != "end_header":
        if lines[i].startswith("element"):
            _, name, n = lines[i].split()
            counts[name] = int(n)
        i += 1
    body = [ln for ln in lines[i + 1 :] if ln.strip()]
    assert len(body) == sum(counts.values()), (len(body), counts)
    return counts
