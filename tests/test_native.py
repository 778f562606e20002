"""Native (C++) host runtime vs the pure-Python oracles: OBJ parsing and
BVH builds must be bit-identical."""

import numpy as np
import pytest

from inverse_path_tracer_tpu.scene import obj_loader
from inverse_path_tracer_tpu.utils import native

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize(
    "asset",
    [
        "CornellBox/CornellBox-Empty-CO.obj",
        "shapes/cube.obj",
        "shapes/sphere.obj",
        "shapes/scene.obj",
    ],
)
def test_obj_native_matches_python(asset):
    path = f"{REF}/{asset}"
    py = obj_loader.load_obj(path, use_native=False)
    nat = native.load_obj_native(path)
    np.testing.assert_array_equal(py.vertices, nat.vertices)
    np.testing.assert_array_equal(py.normals, nat.normals)
    np.testing.assert_array_equal(py.faces, nat.faces)
    np.testing.assert_array_equal(py.face_normals_idx, nat.face_normals_idx)
    assert py.material_names == nat.material_names


def test_obj_native_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nonexistent.obj")


def test_bvh_native_matches_python(cornell_scene):
    from inverse_path_tracer_tpu.ops.bvh import build_bvh

    py = build_bvh(cornell_scene, use_native=False)
    nat = native.build_bvh_native(np.asarray(cornell_scene.vertices))
    np.testing.assert_array_equal(np.asarray(py.tri_order), nat["tri_order"])
    np.testing.assert_array_equal(np.asarray(py.start), nat["start"])
    np.testing.assert_array_equal(np.asarray(py.n_prims), nat["n_prims"])
    np.testing.assert_array_equal(np.asarray(py.right_offset), nat["right_offset"])
    np.testing.assert_allclose(np.asarray(py.bbox_min), nat["bbox_min"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(py.bbox_max), nat["bbox_max"], rtol=1e-6)


def test_bvh_native_sphere():
    from inverse_path_tracer_tpu.ops.bvh import build_bvh
    from inverse_path_tracer_tpu.scene.build import build_scene
    from inverse_path_tracer_tpu.scene.dsl import ObjectParams

    scene = build_scene(
        [ObjectParams(obj_file=f"{REF}/shapes/sphere.obj", mtl_file="*Kd 1 1 1*")]
    )
    py = build_bvh(scene, use_native=False)
    nat = native.build_bvh_native(np.asarray(scene.vertices))
    np.testing.assert_array_equal(np.asarray(py.tri_order), nat["tri_order"])
    np.testing.assert_array_equal(np.asarray(py.right_offset), nat["right_offset"])
