"""ctypes bridge to the native OBJ parser (io/native/obj_loader.cc)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "obj_loader.cc")


class _PtMeshOut(ctypes.Structure):
    _fields_ = [
        ("vertex_count", ctypes.c_uint32),
        ("triangle_count", ctypes.c_uint32),
        ("indices", ctypes.POINTER(ctypes.c_uint32)),
        ("pos", ctypes.POINTER(ctypes.c_float)),
        ("normal", ctypes.POINTER(ctypes.c_float)),
        ("albedo", ctypes.POINTER(ctypes.c_float)),
        ("material", ctypes.POINTER(ctypes.c_float)),
    ]


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        out_dir = os.path.join(_repo_root(), "build", "native")
        os.makedirs(out_dir, exist_ok=True)
        so_path = os.path.join(out_dir, "libptobj.so")
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    [
                        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                        "-ffp-contract=off", _SRC, "-o", so_path,
                    ],
                    check=True,
                    capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        lib = ctypes.CDLL(so_path)
        lib.pt_load_obj.restype = ctypes.c_int
        lib.pt_load_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_PtMeshOut)]
        lib.pt_free_mesh.argtypes = [ctypes.POINTER(_PtMeshOut)]
        _LIB = lib
        return _LIB


def load_obj_native(path: str):
    """Returns (indices, pos, normal, albedo, material) numpy arrays or None."""
    lib = _get_lib()
    if lib is None:
        return None
    out = _PtMeshOut()
    rc = lib.pt_load_obj(path.encode(), ctypes.byref(out))
    if rc != 0:
        raise FileNotFoundError(f"pt_load_obj failed for {path}")
    try:
        k = out.triangle_count * 3
        v = out.vertex_count

        def arr(ptr, shape, dtype):
            n = int(np.prod(shape))
            if n == 0:
                return np.zeros(shape, dtype)
            return np.ctypeslib.as_array(ptr, (n,)).reshape(shape).astype(dtype, copy=True)

        indices = arr(out.indices, (k,), np.uint32)
        pos = arr(out.pos, (v, 3), np.float32)
        normal = arr(out.normal, (v, 3), np.float32)
        albedo = arr(out.albedo, (v, 4), np.float32)
        material = arr(out.material, (v, 4), np.float32)
    finally:
        lib.pt_free_mesh(ctypes.byref(out))
    return indices, pos, normal, albedo, material
