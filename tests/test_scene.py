"""Scene frontend tests: DSL, OBJ/MTL loading, transforms, SoA assembly.

Golden facts from the reference tree (SURVEY.md §1 data layer):
CornellBox-Empty-CO.obj = 9 quads -> 18 triangles; cube.obj = 12 tris;
sphere.obj = 1280 tris with vertex normals; scenes/*.txt = Cornell at
POS(0,0,4) SCL 2 + cube at POS(0,-1.5,4) with random Kd."""

import os

import numpy as np
import pytest

from inverse_path_tracer_tpu.scene import obj_loader
from inverse_path_tracer_tpu.scene.build import build_scene, camera_matrix, load_scene
from inverse_path_tracer_tpu.scene.dsl import (
    ObjectParams,
    load_params,
    object_from_string,
    object_to_string,
    standard_scene_string,
)
from inverse_path_tracer_tpu.config import CameraConfig

REF = "/root/reference"


def test_load_cornell_obj():
    mesh = obj_loader.load_obj(os.path.join(REF, "CornellBox/CornellBox-Empty-CO.obj"))
    assert mesh.vertices.shape == (12, 3)
    assert mesh.faces.shape == (18, 3)  # 9 quads -> 18 tris
    assert mesh.material_names[0] == "floor"
    assert mesh.material_names[-1] == "light"
    assert mesh.mtllibs == ["CornellBox-Empty-CO.mtl"]


def test_quad_split_shortest_diagonal():
    # Square quad: both diagonals equal -> tie goes to the [0,1,3],[1,2,3]
    # split (tiny_obj_loader.h:282-300: the < comparison is false on ties).
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        path = f.name
    mesh = obj_loader.load_obj(path)
    assert mesh.faces.tolist() == [[0, 1, 3], [1, 2, 3]]

    # Non-square: diagonal 0-2 strictly shorter -> [0,1,2],[0,2,3].
    with tempfile.NamedTemporaryFile("w", suffix=".obj", delete=False) as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 0.1 0\nv -3 4 0\nf 1 2 3 4\n")
        path = f.name
    mesh = obj_loader.load_obj(path)
    assert mesh.faces.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_load_mtl_cornell():
    mats = obj_loader.load_mtl(os.path.join(REF, "CornellBox/CornellBox-Empty-CO.mtl"))
    assert set(mats) == {"leftWall", "rightWall", "floor", "ceiling", "backWall", "light"}
    np.testing.assert_allclose(mats["leftWall"].diffuse, (0.953, 0.357, 0.212))
    np.testing.assert_allclose(mats["light"].emission, (10, 10, 10))
    assert mats["light"].is_emissive
    assert not mats["floor"].is_emissive
    assert mats["floor"].shininess == 10.0


def test_inline_material():
    m = obj_loader.parse_inline_material("*Kd 0.25 0.5 0.75*")
    np.testing.assert_allclose(m.diffuse, (0.25, 0.5, 0.75))
    assert m.specular == (0.0, 0.0, 0.0)
    assert m.shininess == 1.0  # tiny_obj InitMaterial default (material.h:350)


def test_dsl_roundtrip():
    s = object_to_string(pos=(1, 2, 3), ori=(0, 0, 0), scl=(2, 2, 2),
                         obj_file="a.obj", mtl_file="*Kd 1 0 0*")
    p = object_from_string(s)
    assert p.pos == (1, 2, 3)
    assert p.scl == (2, 2, 2)
    assert p.mtl_file == "*Kd 1 0 0*"


def test_load_params_scene0():
    params = load_params(os.path.join(REF, "scenes/0.txt"))
    assert len(params) == 2
    assert params[0].pos == (0, 0, 4)
    assert params[0].scl == (2, 2, 2)
    assert params[1].pos == (0, -1.5, 4)
    assert params[1].mtl_file.startswith("*Kd")
    # Omitted ORI/SCL fall back to the documented defaults.
    assert params[1].ori == (0, 0, 0)
    assert params[1].scl == (1, 1, 1)


def test_standard_scene_matches_reference_layout():
    s = standard_scene_string(np.random.default_rng(0))
    assert "POS 0 0 4" in s
    assert "SCL 2.0 2.0 2.0" in s
    assert "POS 0.0 -1.5 4.0" in s


def test_build_scene_counts(cornell_scene):
    assert cornell_scene.n_tri == 30  # 18 Cornell + 12 cube
    assert cornell_scene.n_emissive == 2  # the light quad's 2 triangles
    # Light triangles are the last two of the Cornell object (faces 17,18
    # of the obj -> global indices 16,17).
    assert cornell_scene.emissive_idx.tolist() == [16, 17]


def test_transformed_vertices(cornell_scene):
    # Cornell box: unit cube verts scaled by 2, translated (0,0,4):
    # x,y in [-2,2], z in [2,6].
    v = np.asarray(cornell_scene.vertices[:18])
    assert v[..., 0].min() == -2 and v[..., 0].max() == 2
    assert v[..., 2].min() == 2 and v[..., 2].max() == 6
    # Cube: 0.5-halfwidth cube at (0,-1.5,4).
    vc = np.asarray(cornell_scene.vertices[18:])
    np.testing.assert_allclose(vc[..., 1].min(), -2.0)
    np.testing.assert_allclose(vc[..., 2].max(), 4.5)


def test_materials_and_labels(cornell_scene):
    d = np.asarray(cornell_scene.diffuse)
    # floor (tris 0,1) is white-ish 0.725 0.71 0.68
    np.testing.assert_allclose(d[0], (0.725, 0.71, 0.68), rtol=1e-6)
    # cube tris all share the scene-0 random Kd
    kd = d[18]
    np.testing.assert_allclose(
        kd, (0.9041462985304743, 0.5854651848798454, 0.007022117649276849), rtol=1e-6
    )
    assert (d[18:] == d[18]).all()
    # emission on light tris = 10
    e = np.asarray(cornell_scene.emission)
    np.testing.assert_allclose(e[16], (10, 10, 10))
    np.testing.assert_allclose(e[:16], 0)


def test_area_and_normals(cornell_scene):
    area = np.asarray(cornell_scene.area)
    # Floor quad spans 4x4 after scale 2 -> each tri 8.0; light spans
    # 2x2 -> each tri 2.0.
    np.testing.assert_allclose(area[0], 8.0, rtol=1e-6)
    np.testing.assert_allclose(area[16], 2.0, rtol=1e-6)
    n = np.asarray(cornell_scene.face_normal)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_rotation_axis_angle():
    # 90 deg about z: ORI = (0, 0, pi/2).
    import math

    params = ObjectParams(
        pos=(0, 0, 0),
        ori=(0, 0, math.pi / 2),
        scl=(1, 1, 1),
        obj_file=os.path.join(REF, "shapes/cube.obj"),
        mtl_file="*Kd 1 1 1*",
    )
    sc = build_scene([params])
    v = np.asarray(sc.vertices).reshape(-1, 3)
    # Rotating the symmetric cube about z maps its vertex set to itself.
    orig = obj_loader.load_obj(os.path.join(REF, "shapes/cube.obj")).vertices
    got = set(map(tuple, np.round(v, 5)))
    want = set(map(tuple, np.round(orig, 5)))
    assert got == want


def test_sphere_vertex_normals():
    params = ObjectParams(obj_file=os.path.join(REF, "shapes/sphere.obj"),
                          mtl_file="*Kd 1 1 1*")
    sc = build_scene([params])
    assert sc.n_tri == 1280
    # Sphere has vn records: shading normals should differ from the face
    # normal somewhere.
    fn = np.asarray(sc.face_normal)
    vn = np.asarray(sc.vertex_normals)
    assert not np.allclose(vn[:, 0, :], fn, atol=1e-3)


def test_camera_matrix_default():
    m = camera_matrix(CameraConfig())
    # Default camera: M33 = diag(-1, 1, 1) (x-mirror from s=(-1,0,0) and
    # tan(45 deg)=1; see scene/build.py docstring).
    np.testing.assert_allclose(m, np.diag([-1.0, 1.0, 1.0]), atol=1e-6)
