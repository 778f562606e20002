"""Scene description DSL: the text format consumed/produced by the
reference's Python bridge (reference ipt_cuda.py:17-107).

Format::

    OBJECT
    POS x y z
    ORI x y z          # axis-angle: axis = ORI/|ORI|, angle = |ORI| (rad)
    SCL x y z
    OBJ path/to.obj
    MTL path/to.mtl    # or inline: *Kd r g b*

Defaults when omitted: POS 0 0 0, ORI 0 0 0, SCL 1 1 1
(reference ipt_cuda.py:55-57).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

# Shape enum (reference ipt_cuda.py:9).
CUBE, SPHERE, CORNELL, OTHER = 0, 1, 2, 3

SHAPE_OBJ_FILES = {
    CUBE: "./shapes/cube.obj",
    SPHERE: "./shapes/sphere.obj",
    CORNELL: "./CornellBox/CornellBox-Empty-CO.obj",
}
CORNELL_MTL_FILE = "./CornellBox/CornellBox-Empty-CO.mtl"


@dataclasses.dataclass
class ObjectParams:
    """One object instance (reference ObjParams_t scene_basics.h:112-137)."""

    pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    ori: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    scl: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    obj_file: str = ""
    mtl_file: str = ""


def rand_mtl(rng: Optional[np.random.Generator] = None) -> str:
    """Random grayscale-ish inline diffuse (reference ipt_cuda.py:14-15 —
    note the reference samples three *independent* uniforms)."""
    rng = rng or np.random.default_rng()
    return f"*Kd {rng.uniform()} {rng.uniform()} {rng.uniform()}*"


def object_to_string(
    shp: Optional[int] = None,
    pos: Optional[Sequence[float]] = None,
    ori: Optional[Sequence[float]] = None,
    scl: Optional[Sequence[float]] = None,
    obj_file: Optional[str] = None,
    mtl_file: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
) -> str:
    """Serialize one object block (reference ipt_cuda.py:17-37)."""
    s = ""
    if pos is not None:
        s += f"POS {pos[0]} {pos[1]} {pos[2]}\n"
    if ori is not None:
        s += f"ORI {ori[0]} {ori[1]} {ori[2]}\n"
    if scl is not None:
        s += f"SCL {scl[0]} {scl[1]} {scl[2]}\n"
    if shp in (CUBE, SPHERE):
        obj_file = SHAPE_OBJ_FILES[shp]
        mtl_file = rand_mtl(rng) if mtl_file is None else mtl_file
    elif shp is CORNELL:
        obj_file = SHAPE_OBJ_FILES[CORNELL]
        mtl_file = CORNELL_MTL_FILE
    assert obj_file is not None and mtl_file is not None
    s += f"OBJ {obj_file}\n"
    s += f"MTL {mtl_file}\n"
    return s


def object_from_string(string: str) -> ObjectParams:
    """Parse one object block (reference ipt_cuda.py:39-59)."""
    pos = ori = scl = obj_file = mtl_file = None
    for line in string.split("\n"):
        items = line.strip().split(" ")
        token, values = items[0], items[1:]
        if token == "POS":
            pos = tuple(float(x) for x in values)
        elif token == "ORI":
            ori = tuple(float(x) for x in values)
        elif token == "SCL":
            scl = tuple(float(x) for x in values)
        elif token == "OBJ":
            obj_file = values[0]
        elif token == "MTL":
            # Inline materials contain spaces (reference ipt_cuda.py:54).
            mtl_file = " ".join(values)
    if pos is None:
        pos = (0.0, 0.0, 0.0)
    if ori is None:
        ori = (0.0, 0.0, 0.0)
    if scl is None:
        scl = (1.0, 1.0, 1.0)
    assert obj_file is not None and mtl_file is not None
    return ObjectParams(pos=pos, ori=ori, scl=scl, obj_file=obj_file, mtl_file=mtl_file)


def load_params(filename: str) -> List[ObjectParams]:
    """Parse a scene file into object params (reference ipt_cuda.py:91-107)."""
    with open(filename, "r") as f:
        lines = f.readlines()
    params: List[ObjectParams] = []
    curr = ""
    for line in lines:
        line = line.strip()
        if line == "OBJECT":
            if curr:
                params.append(object_from_string(curr))
            curr = ""
        else:
            curr += line + "\n"
    params.append(object_from_string(curr))
    return params


def standard_scene_string(rng: Optional[np.random.Generator] = None,
                          mtl_file: Optional[str] = None) -> str:
    """The scene composition used by the reference's dataset generator
    (reference ipt_cuda.py:115-128): Cornell box at POS (0,0,4) SCL 2 plus
    a unit cube at POS (0,-1.5,4) with a random diffuse Kd."""
    s = "OBJECT\n"
    s += object_to_string(shp=CORNELL, pos=(0, 0, 4), scl=(2.0, 2.0, 2.0))
    s += "OBJECT\n"
    s += object_to_string(shp=CUBE, pos=(0.0, -1.5, 4.0), mtl_file=mtl_file, rng=rng)
    return s


def generate_scene_files(n: int, out_dir: str = "scenes", seed: int = 0) -> List[str]:
    """Write n scene files like the reference generator (ipt_cuda.py:115-128),
    but seeded for reproducibility (the reference uses an unseeded global
    numpy RNG)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        path = os.path.join(out_dir, f"{i}.txt")
        with open(path, "w") as f:
            f.write(standard_scene_string(rng))
        paths.append(path)
    return paths
