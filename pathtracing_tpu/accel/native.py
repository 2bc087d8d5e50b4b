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


# ---------------------------------------------------------------------------
# Native wide-BVH mega-table builder (accel/native/wide_builder.cc)
# ---------------------------------------------------------------------------

_WIDE_LOCK = threading.Lock()
_WIDE_LIB = None
_WIDE_TRIED = False

_WIDE_SRC = os.path.join(os.path.dirname(__file__), "native", "wide_builder.cc")


def _build_wide_lib() -> str | None:
    out_dir = os.path.join(_repo_root(), "build", "native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, "libptwide.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_WIDE_SRC):
        return so_path
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        "-ffp-contract=off",  # bit-parity with the Python builder
        _WIDE_SRC, "-o", so_path,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return so_path


def get_wide_lib():
    """Returns the loaded wide-builder library or None when unavailable."""
    global _WIDE_LIB, _WIDE_TRIED
    with _WIDE_LOCK:
        if _WIDE_TRIED:
            return _WIDE_LIB
        _WIDE_TRIED = True
        so_path = _build_wide_lib()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pt_wide_tree_create.restype = ctypes.c_void_p
        lib.pt_wide_tree_create.argtypes = [
            u32p, f32p, ctypes.c_uint32, f32p, u32p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.pt_wide_subtree_create.restype = ctypes.c_void_p
        lib.pt_wide_subtree_create.argtypes = [
            u32p, f32p, ctypes.c_uint32, f32p, u32p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, u32p,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.pt_wide_rows_count.restype = ctypes.c_int64
        lib.pt_wide_rows_count.argtypes = [ctypes.c_void_p]
        lib.pt_wide_copy.restype = None
        lib.pt_wide_copy.argtypes = [ctypes.c_void_p, f32p, u32p]
        lib.pt_wide_destroy.restype = None
        lib.pt_wide_destroy.argtypes = [ctypes.c_void_p]
        _WIDE_LIB = lib
        return _WIDE_LIB


def build_wide_tree_native(
    links: np.ndarray,      # (8n, 2) u32, octant-major
    nodes6: np.ndarray,     # (n, 6) f32
    tri9: np.ndarray | None,           # (T, 9) f32 (BLAS mode)
    payload_cursor: np.ndarray | None,  # (P,) u32 (TLAS mode)
    leaf_bundle: int,
    n_slots: int,
    leaf_tris: int,
    base_row: int,
    exit_sentinel: int,
    root_node: int = 0,
    exit8: np.ndarray | None = None,   # (8,) u32 per-octant exit cursors
    n_octants: int = 8,
    stub: bool = False,
):
    """8-octant wide trees (+ leaf chains) for one binary BVH (or the
    subtree rooted at ``root_node`` — the chunked static region emits one
    wide tree per chunk, accel/chunks.py). ``exit8`` overrides
    ``exit_sentinel`` per octant so dynamic TLAS trees can chain into the
    static TLAS root of the same octant.

    Returns (rows (K, w_row) f32, root8 (8,) u32) or None when the native
    library is unavailable. Byte-identical to the Python WideBuilder
    (tests/test_wide_native.py).
    """
    lib = get_wide_lib()
    if lib is None:
        return None
    n = len(nodes6)
    links = np.ascontiguousarray(links, np.uint32)
    nodes6 = np.ascontiguousarray(nodes6, np.float32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    tri9_p = None
    if tri9 is not None:
        tri9 = np.ascontiguousarray(tri9, np.float32)
        tri9_p = tri9.ctypes.data_as(f32p)
    pc_p = None
    if payload_cursor is not None:
        payload_cursor = np.ascontiguousarray(payload_cursor, np.uint32)
        pc_p = payload_cursor.ctypes.data_as(u32p)
    e8_p = None
    if exit8 is not None:
        exit8 = np.ascontiguousarray(exit8, np.uint32)
        e8_p = exit8.ctypes.data_as(u32p)
    h = lib.pt_wide_subtree_create(
        links.ctypes.data_as(u32p), nodes6.ctypes.data_as(f32p), n,
        tri9_p, pc_p, leaf_bundle, n_slots, leaf_tris, base_row,
        np.uint32(exit_sentinel), np.uint32(root_node), e8_p,
        np.uint32(n_octants), np.uint32(1 if stub else 0),
    )
    if not h:
        return None
    try:
        k = lib.pt_wide_rows_count(h)
        from pathtracing_tpu.accel.wide import WideLayout

        w_row = WideLayout(n_slots, leaf_tris, stub=stub).w_row
        rows = np.empty((k, w_row), np.float32)
        root8 = np.empty(8, np.uint32)
        lib.pt_wide_copy(
            h, rows.ctypes.data_as(f32p), root8.ctypes.data_as(u32p)
        )
    finally:
        lib.pt_wide_destroy(h)
    return rows, root8
