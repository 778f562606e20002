"""ctypes bridge to the native host runtime (native/src/ipt_native.cpp).

Role-reversal of the reference's FFI: there, Python drives CUDA/C++
renderers through ctypes (ipt_cuda.py:7-8); here the renderer is JAX and
the *host-side ingest* (OBJ parsing, BVH builds) has a C++ fast path.
The library is compiled on demand with g++ into a cache directory and
loaded lazily; every consumer falls back to the pure-Python
implementation when the toolchain is unavailable, and tests assert the
two produce identical results.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "src",
    "ipt_native.cpp",
)

_lib = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get("IPT_NO_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), "ipt_native_cache")
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, f"ipt_native_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_error.restype = ctypes.c_char_p
        lib.obj_error.argtypes = [ctypes.c_void_p]
        lib.obj_counts.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_int32)
        ] * 4
        lib.obj_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.obj_mat_name.restype = ctypes.c_char_p
        lib.obj_mat_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.obj_mtllibs.restype = ctypes.c_char_p
        lib.obj_mtllibs.argtypes = [ctypes.c_void_p]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.bvh_n_nodes.restype = ctypes.c_int32
        lib.bvh_n_nodes.argtypes = [ctypes.c_void_p]
        lib.bvh_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    except Exception:
        _lib_failed = True
        return None


def native_available() -> bool:
    return _build_lib() is not None


def load_obj_native(path: str):
    """Native OBJ parse -> the same ObjMesh as obj_loader.load_obj, or
    None if the native library is unavailable."""
    lib = _build_lib()
    if lib is None:
        return None
    from inverse_path_tracer_tpu.scene.obj_loader import ObjMesh

    h = lib.obj_parse(path.encode())
    try:
        err = lib.obj_error(h)
        if err:
            raise FileNotFoundError(err.decode())
        nv = ctypes.c_int32()
        nn = ctypes.c_int32()
        nf = ctypes.c_int32()
        nm = ctypes.c_int32()
        lib.obj_counts(h, nv, nn, nf, nm)
        verts = np.zeros((nv.value, 3), dtype=np.float32)
        norms = np.zeros((nn.value, 3), dtype=np.float32)
        faces = np.zeros((nf.value, 3), dtype=np.int32)
        fnorm = np.zeros((nf.value, 3), dtype=np.int32)
        fmat = np.zeros((nf.value,), dtype=np.int32)
        lib.obj_fill(
            h,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            norms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fnorm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fmat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        names = [
            lib.obj_mat_name(h, i).decode() for i in range(nm.value)
        ]
        mat_names = [names[i] if i >= 0 else None for i in fmat]
        raw_libs = lib.obj_mtllibs(h).decode()
        mtllibs = raw_libs.split("\n") if raw_libs else []
        return ObjMesh(
            vertices=verts,
            normals=norms,
            faces=faces,
            face_normals_idx=fnorm,
            material_names=mat_names,
            mtllibs=mtllibs,
        )
    finally:
        lib.obj_free(h)


def build_bvh_native(vertices: np.ndarray, leaf_size: int = 4):
    """Native BVH build over (nT,3,3) vertices -> SoA dict, or None."""
    lib = _build_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float32).reshape(-1, 9)
    n_t = v.shape[0]
    h = lib.bvh_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_t, leaf_size
    )
    try:
        m = lib.bvh_n_nodes(h)
        bmin = np.zeros((m, 3), dtype=np.float32)
        bmax = np.zeros((m, 3), dtype=np.float32)
        start = np.zeros((m,), dtype=np.int32)
        n_prims = np.zeros((m,), dtype=np.int32)
        right = np.zeros((m,), dtype=np.int32)
        order = np.zeros((n_t,), dtype=np.int32)
        lib.bvh_fill(
            h,
            bmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_prims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return {
            "bbox_min": bmin,
            "bbox_max": bmax,
            "start": start,
            "n_prims": n_prims,
            "right_offset": right,
            "tri_order": order,
        }
    finally:
        lib.bvh_free(h)
