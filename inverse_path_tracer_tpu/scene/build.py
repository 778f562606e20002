"""Scene construction: DSL/OBJ/MTL -> SceneData pytree of flat SoA arrays.

TPU-native replacement for the reference's pointer-rich scene runtime
(reference scene.h:86-173 Scene, scene_basics.h:139-290 Mesh,
scene_basics.h:64-110 Triangle, all placement-new'd into CUDA managed
memory).  Here the scene is a NamedTuple of device arrays, replicated
across chips; materials are a standalone (nT, 3) parameter array — the
thing set/getMaterials mutate in place in the reference
(inv_path_trace.cu:210-221) — which makes the renderer differentiable in
Kd by construction.

Geometry conventions replicated exactly:
  * object transform T = translate(pos) @ rotate(axis-angle |ori|) @
    scale(scl)  (reference scene_basics.h:148-157); vertices by T,
    vertex normals by inv(T.linear().T) *unnormalized*
    (scene_basics.h:240-243 — tiny_obj normals are stored untransformed
    by length; Triangle::getNormal normalizes after interpolation).
  * zero ORI => identity rotation (Eigen 3.3 normalize() is a no-op on
    zero vectors).
  * face normal = normalize((v1-v0) x (v2-v1)), area = |cross|/2
    (scene_basics.h:86-91).
  * emissive rule: any Ke channel > 0 (scene_basics.h:183-187); global
    triangle/emissive indices are per-object offsets in object order
    (scene.h:100-112, scene_basics.h:467-474).
  * camera matrix M = S @ V^T (reference scene.h:75-77 uses the
    *transpose*, not the inverse, of the view matrix; because the bottom
    row of V is (0,0,0,1), the translation column of M is zero and ray
    origins transform as p' = M33 @ p — eye displacement is dropped.
    Identical to the correct transform for the default origin camera;
    replicated as the behavioral contract).
"""

from __future__ import annotations

import math
import os
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from inverse_path_tracer_tpu.config import CameraConfig
from inverse_path_tracer_tpu.scene import obj_loader
from inverse_path_tracer_tpu.scene.dsl import ObjectParams, load_params


class SceneData(NamedTuple):
    """Flat SoA scene pytree.  All leaves are jnp.float32 unless noted.

    Static sizes: nT = vertices.shape[0], nE = emissive_idx.shape[0] —
    shapes are static under jit, so no separate scalar fields are needed.
    """

    vertices: jnp.ndarray  # (nT, 3, 3)  [tri, corner, xyz]
    # Per-corner shading normals, (nT, 3, 3) — OR (nT, 0, 3) when no
    # object supplies vertex normals.  The empty second dim is a *static*
    # signal (shapes are static under jit) that lets smooth_normal skip
    # the barycentric interpolation entirely: for flat meshes
    # Triangle::getNormal degenerates to the face normal exactly.
    vertex_normals: jnp.ndarray
    face_normal: jnp.ndarray  # (nT, 3) unit geometric normal
    center: jnp.ndarray  # (nT, 3) centroid
    area: jnp.ndarray  # (nT,)
    edge_out: jnp.ndarray  # (nT, 3, 3) outward edge-plane normals
    edge_d: jnp.ndarray  # (nT, 3) edge-plane offsets
    diffuse: jnp.ndarray  # (nT, 3) default Kd (the learnable labels)
    specular: jnp.ndarray  # (nT, 3)
    emission: jnp.ndarray  # (nT, 3)
    shininess: jnp.ndarray  # (nT,)
    emissive_idx: jnp.ndarray  # (nE,) int32 global triangle index
    emissive_p: jnp.ndarray  # (nE,) selection prob = area_i / sum(area)
    emissive_cdf: jnp.ndarray  # (nE,) inclusive cumsum of emissive_p
    # (nS,) int32 indices of triangles with any Ks channel > 0.  Like
    # vertex_normals' empty second dim, the empty case is a *static*
    # signal: the Pallas kernels drop every specular term (the Phong
    # pow() transcendentals, ~25% of the bounce loop) when nS == 0 —
    # true for every reference asset.
    specular_idx: jnp.ndarray
    cam_m33: jnp.ndarray  # (3, 3) ray transform (see module docstring)
    # Packed homogeneous plane equations for the fast intersector:
    # (4, 4*nT), column block t holds 4 plane 4-vectors [P0 E0 E1 E2]
    # with P0 = (n, -c.n) and Ej = (out_j, d_j), so that for homogeneous
    # p4 = (p, 1), d4 = (d, 0):
    #   A = p4 @ planes, B = d4 @ planes;
    #   t = A[..,0] / -B[..,0];  sd_j = A[..,1+j] + t * B[..,1+j].
    # Two (R,4)x(4,4T) matmuls replace the eight (R,3)x(3,T) sweeps.
    plane_mat: jnp.ndarray
    # Optional linearized BVH (the 6 BVHData arrays as a tuple; empty
    # tuple = none attached).  Populated by ops.bvh.attach_bvh /
    # load_scene(with_bvh=True); consumed when cfg.intersect == "bvh".
    bvh: tuple = ()

    @property
    def n_tri(self) -> int:
        return self.vertices.shape[0]

    @property
    def n_emissive(self) -> int:
        return self.emissive_idx.shape[0]


def _axis_angle_matrix(ori: Sequence[float]) -> np.ndarray:
    """Rodrigues rotation for axis-angle vector `ori` (angle = |ori|)."""
    ori = np.asarray(ori, dtype=np.float64)
    angle = float(np.linalg.norm(ori))
    if angle == 0.0:
        return np.eye(3)
    axis = ori / angle
    k = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + math.sin(angle) * k + (1 - math.cos(angle)) * (k @ k)


def camera_matrix(cam: CameraConfig) -> np.ndarray:
    """M33 = S3 @ R^T with R rows (s, u, f) (reference scene.h:49-77)."""
    f = np.asarray(cam.look, dtype=np.float64)
    n = np.linalg.norm(f)
    f = f / n if n > 0 else f
    up = np.asarray(cam.up, dtype=np.float64)
    n = np.linalg.norm(up)
    up = up / n if n > 0 else up
    s = np.cross(f, up)
    n = np.linalg.norm(s)
    s = s / n if n > 0 else s
    u = np.cross(s, f)
    n = np.linalg.norm(u)
    u = u / n if n > 0 else u
    r = np.stack([s, u, f], axis=0)  # rows
    ha = math.pi * cam.height_angle_deg / 360.0
    s3 = np.diag([math.tan(ha), math.tan(ha * cam.aspect_ratio), 1.0])
    return (s3 @ r.T).astype(np.float32)


def _resolve_path(path: str, asset_root: Optional[str]) -> str:
    if os.path.isabs(path) or asset_root is None:
        return path
    return os.path.normpath(os.path.join(asset_root, path))


class _HostMesh(NamedTuple):
    vertices: np.ndarray  # (t, 3, 3)
    vertex_normals: np.ndarray  # (t, 3, 3)
    diffuse: np.ndarray
    specular: np.ndarray
    emission: np.ndarray
    shininess: np.ndarray


def _build_object(obj: ObjectParams, asset_root: Optional[str]) -> _HostMesh:
    mesh = obj_loader.load_obj(_resolve_path(obj.obj_file, asset_root))

    if obj.mtl_file.strip().startswith("*"):
        inline = obj_loader.parse_inline_material(obj.mtl_file)
        materials = {}
        default_mat = inline
    else:
        materials = obj_loader.load_mtl(_resolve_path(obj.mtl_file, asset_root))
        default_mat = obj_loader.Material(name="<default>")

    # Affine transform (reference scene_basics.h:148-157).
    rot = _axis_angle_matrix(obj.ori)
    linear = rot @ np.diag(np.asarray(obj.scl, dtype=np.float64))
    trans = np.asarray(obj.pos, dtype=np.float64)
    normal_xf = np.linalg.inv(linear.T)  # scene_basics.h:240

    v = mesh.vertices.astype(np.float64) @ linear.T + trans  # (nV, 3)
    vn = (
        mesh.normals.astype(np.float64) @ normal_xf.T
        if mesh.normals.size
        else np.zeros((0, 3))
    )

    t = mesh.faces.shape[0]
    tri_v = v[mesh.faces]  # (t, 3, 3)

    # Per-corner shading normals: transformed vn when the OBJ supplies a
    # full normal set (reference scene_basics.h:176-181 gates on
    # ns.size() == vs.size()), else the face normal.
    a = tri_v[:, 1] - tri_v[:, 0]
    b = tri_v[:, 2] - tri_v[:, 1]
    cross = np.cross(a, b)
    norm = np.linalg.norm(cross, axis=-1, keepdims=True)
    face_n = np.where(norm > 0, cross / np.where(norm > 0, norm, 1.0), 0.0)

    use_vn = vn.shape[0] == v.shape[0] and np.all(mesh.face_normals_idx >= 0)
    if use_vn:
        tri_n = vn[mesh.face_normals_idx]
    else:
        # Marker: empty normals; resolved in build_scene (kept empty when
        # NO object has vertex normals, else filled with face normals).
        tri_n = np.zeros((t, 0, 3))

    diffuse = np.zeros((t, 3))
    specular = np.zeros((t, 3))
    emission = np.zeros((t, 3))
    shininess = np.ones((t,))
    for i, name in enumerate(mesh.material_names):
        m = materials.get(name, default_mat) if name is not None else default_mat
        diffuse[i] = m.diffuse
        specular[i] = m.specular
        emission[i] = m.emission
        shininess[i] = m.shininess

    return _HostMesh(
        vertices=tri_v.astype(np.float32),
        vertex_normals=tri_n.astype(np.float32),
        diffuse=diffuse.astype(np.float32),
        specular=specular.astype(np.float32),
        emission=emission.astype(np.float32),
        shininess=shininess.astype(np.float32),
    )


def build_scene(
    objects: List[ObjectParams],
    camera: CameraConfig = CameraConfig(),
    asset_root: Optional[str] = None,
) -> SceneData:
    """Assemble a SceneData pytree from object params.

    Objects are concatenated in order with global triangle / emissive
    index offsets (reference scene.h:100-112)."""
    meshes = [_build_object(o, asset_root) for o in objects]

    vertices = np.concatenate([m.vertices for m in meshes], axis=0)
    # Shading normals: if NO object has vertex normals the array stays
    # (nT, 0, 3) — the static flat-shading signal; if any object has
    # them, flat objects get their face normal at each corner (reference
    # scene_basics.h:93-95 does the same per triangle).
    if all(m.vertex_normals.shape[1] == 0 for m in meshes):
        vertex_normals = np.zeros((vertices.shape[0], 0, 3), dtype=np.float32)
    else:
        filled = []
        for m in meshes:
            if m.vertex_normals.shape[1] == 0:
                a = m.vertices[:, 1] - m.vertices[:, 0]
                b = m.vertices[:, 2] - m.vertices[:, 1]
                cr = np.cross(a, b)
                nn = np.linalg.norm(cr, axis=-1, keepdims=True)
                fn = np.where(nn > 0, cr / np.where(nn > 0, nn, 1.0), 0.0)
                filled.append(np.repeat(fn[:, None, :], 3, axis=1).astype(np.float32))
            else:
                filled.append(m.vertex_normals)
        vertex_normals = np.concatenate(filled, axis=0)
    diffuse = np.concatenate([m.diffuse for m in meshes], axis=0)
    specular = np.concatenate([m.specular for m in meshes], axis=0)
    emission = np.concatenate([m.emission for m in meshes], axis=0)
    shininess = np.concatenate([m.shininess for m in meshes], axis=0)

    # Derived per-triangle geometry, float32 to match the reference's
    # device-side math (scene_basics.h:80-95, 497-503).
    v32 = vertices.astype(np.float32)
    a = v32[:, 1] - v32[:, 0]
    b = v32[:, 2] - v32[:, 1]
    cross = np.cross(a, b)
    norm = np.linalg.norm(cross, axis=-1, keepdims=True)
    area = (norm[:, 0] / 2.0).astype(np.float32)
    face_normal = np.where(norm > 0, cross / np.where(norm > 0, norm, 1.0), 0.0)
    center = v32.mean(axis=1)

    # Edge planes for the inside test (scene_basics.h:448-451, 497-503):
    # out_j = normalize((v_{j+1} - v_j) x n); d_j = -out_j . (v_j + v_{j+1})/2;
    # point is inside iff point . out_j + d_j <= 0 for all j.
    edge_out = np.zeros_like(vertices, dtype=np.float32)
    edge_d = np.zeros((vertices.shape[0], 3), dtype=np.float32)
    for j in range(3):
        s0 = v32[:, j]
        s1 = v32[:, (j + 1) % 3]
        out = np.cross(s1 - s0, face_normal)
        onorm = np.linalg.norm(out, axis=-1, keepdims=True)
        out = np.where(onorm > 0, out / np.where(onorm > 0, onorm, 1.0), 0.0)
        edge_out[:, j] = out
        edge_d[:, j] = -np.sum(out * (s1 + s0), axis=-1) / 2.0

    # Packed plane matrix for the 2-matmul intersector (see SceneData).
    n_t = vertices.shape[0]
    planes = np.zeros((n_t, 4, 4), dtype=np.float32)
    planes[:, 0, :3] = face_normal
    planes[:, 0, 3] = -np.sum(center * face_normal, axis=-1)
    for j in range(3):
        planes[:, 1 + j, :3] = edge_out[:, j]
        planes[:, 1 + j, 3] = edge_d[:, j]
    plane_mat = np.ascontiguousarray(
        planes.transpose(2, 0, 1).reshape(4, 4 * n_t)
    )

    emissive_mask = (emission > 0).any(axis=-1)
    emissive_idx = np.nonzero(emissive_mask)[0].astype(np.int32)
    specular_idx = np.nonzero((specular > 0).any(axis=-1))[0].astype(np.int32)
    e_area = area[emissive_idx].astype(np.float32)
    total = e_area.sum()
    emissive_p = e_area / total if emissive_idx.size else e_area
    emissive_cdf = np.cumsum(emissive_p).astype(np.float32)

    return SceneData(
        vertices=jnp.asarray(vertices),
        vertex_normals=jnp.asarray(vertex_normals),
        face_normal=jnp.asarray(face_normal.astype(np.float32)),
        center=jnp.asarray(center),
        area=jnp.asarray(area),
        edge_out=jnp.asarray(edge_out),
        edge_d=jnp.asarray(edge_d),
        diffuse=jnp.asarray(diffuse),
        specular=jnp.asarray(specular),
        emission=jnp.asarray(emission),
        shininess=jnp.asarray(shininess),
        emissive_idx=jnp.asarray(emissive_idx),
        emissive_p=jnp.asarray(emissive_p.astype(np.float32)),
        emissive_cdf=jnp.asarray(emissive_cdf),
        specular_idx=jnp.asarray(specular_idx),
        cam_m33=jnp.asarray(camera_matrix(camera)),
        plane_mat=jnp.asarray(plane_mat),
    )


def load_scene(
    scenefile: str,
    camera: CameraConfig = CameraConfig(),
    asset_root: Optional[str] = None,
    with_bvh: bool = False,
) -> SceneData:
    """Load a scene DSL file (reference ipt_cuda.py:109-113 load_scene).

    asset_root defaults to the parent of the scene file's directory —
    the reference resolves asset paths relative to the repo root and
    keeps scene files in `scenes/`."""
    if asset_root is None:
        asset_root = os.path.dirname(os.path.dirname(os.path.abspath(scenefile)))
    scene = build_scene(load_params(scenefile), camera=camera, asset_root=asset_root)
    if with_bvh:
        from inverse_path_tracer_tpu.ops.bvh import attach_bvh

        scene = attach_bvh(scene)
    return scene
