from inverse_path_tracer_tpu.scene.build import SceneData, build_scene, load_scene
from inverse_path_tracer_tpu.scene.dsl import (
    ObjectParams,
    load_params,
    object_to_string,
    object_from_string,
    rand_mtl,
)
from inverse_path_tracer_tpu.scene.obj_loader import load_obj, load_mtl, Material

__all__ = [
    "SceneData",
    "build_scene",
    "load_scene",
    "ObjectParams",
    "load_params",
    "object_to_string",
    "object_from_string",
    "rand_mtl",
    "load_obj",
    "load_mtl",
    "Material",
]
