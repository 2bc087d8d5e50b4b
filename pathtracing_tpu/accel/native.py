"""ctypes loader for the native C++ BVH builder.

The reference keeps its builder native (bvh.cc); so do we. The shared
library is compiled on first use with g++ (no pip deps) into build/native/
and cached by source mtime. Falls back to the numpy builder transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "bvh_builder.cc")


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_lib() -> str | None:
    out_dir = os.path.join(_repo_root(), "build", "native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, "libptbvh.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        "-ffp-contract=off",  # bit-parity with the IEEE oracle
        _SRC, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return so_path


def get_lib():
    """Returns the loaded library or None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so_path = _build_lib()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        lib.pt_build_bvh.restype = ctypes.c_int64
        lib.pt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32,
        ]
        _LIB = lib
        return _LIB


def build_bvh_native(lmin: np.ndarray, lmax: np.ndarray, lidx: np.ndarray):
    """Build node/link arrays for the given leaves, or None if no native lib.

    Returns (nodes (N,6) f32, links (8N,2) u32) in the reference layout.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(lidx)
    if n == 0:
        return np.zeros((0, 6), np.float32), np.zeros((0, 2), np.uint32)
    cap = 2 * n + 8
    lmin = np.ascontiguousarray(lmin, np.float32)
    lmax = np.ascontiguousarray(lmax, np.float32)
    lidx = np.ascontiguousarray(lidx, np.uint32)
    nodes = np.empty((cap, 6), np.float32)
    links = np.empty((8 * cap, 2), np.uint32)
    count = lib.pt_build_bvh(
        lmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lidx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        links.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cap,
    )
    if count < 0:
        raise RuntimeError("BVH node capacity exceeded (should be impossible)")
    count = int(count)
    return nodes[:count].copy(), links[: 8 * count].copy()
