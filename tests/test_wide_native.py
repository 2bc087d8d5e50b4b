"""Native wide-table builder (accel/native/wide_builder.cc) vs the Python
WideBuilder: the mega-table bytes, root cursors, and per-frame tails must be
IDENTICAL — the native builder exists purely for speed (the full scene's
per-frame TLAS tail is ~64k rows; Python takes ~30 s/frame, C++ ~100 ms)."""

import numpy as np
import pytest

from pathtracing_tpu.accel.native import get_wide_lib
from pathtracing_tpu.accel.wide import (
    WideStaticRegion,
    build_frame_tail,
    build_wide_tables,
    LAYOUT_W8,
    LAYOUT_W16,
)
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden
from golden_scene import _GoldenInstance


@pytest.fixture(scope="module")
def golden():
    g = load_golden(str(require_golden("scene.gold")))
    if get_wide_lib() is None:
        pytest.skip("native wide builder unavailable (no g++)")
    instances = [
        _GoldenInstance(g["instances_u"][i], g["instances_f"][i])
        for i in range(len(g["instances_u"]))
    ]
    return g, instances


class _Subframe:
    def __init__(self, tlas):
        self.tlas = tlas


class _Tlas:
    def __init__(self, count, offset):
        self.node_count = count
        self.node_offset = offset


@pytest.mark.parametrize("layout", [LAYOUT_W8, LAYOUT_W16], ids=["w8", "w16"])
def test_native_matches_python(golden, layout, monkeypatch):
    g, instances = golden
    mesh_arrays = (g["indices"], g["pos"], g["normal"], g["albedo"],
                   g["material"])
    subframes = [_Subframe(_Tlas(int(g["tlas"][0]), int(g["tlas"][1])))]

    def build(native: bool):
        monkeypatch.setenv("PT_NATIVE_WIDE", "1" if native else "0")
        static = WideStaticRegion(
            mesh_arrays, g["nodes"], g["links"],
            [(i.mesh, i.blas) for i in instances],
            leaf_bundle=None, layout=layout,
        )
        tail, root = build_frame_tail(
            static, g["nodes"], g["links"], instances, subframes
        )
        return static, tail, root

    s_py, t_py, r_py = build(False)
    s_nat, t_nat, r_nat = build(True)

    np.testing.assert_array_equal(
        s_nat.rows.view(np.uint32), s_py.rows.view(np.uint32)
    )
    assert s_nat.blas_roots.keys() == s_py.blas_roots.keys()
    for k in s_py.blas_roots:
        np.testing.assert_array_equal(
            np.asarray(s_nat.blas_roots[k], np.uint32),
            np.asarray(s_py.blas_roots[k], np.uint32),
        )
    np.testing.assert_array_equal(
        t_nat.view(np.uint32), t_py.view(np.uint32)
    )
    np.testing.assert_array_equal(r_nat, r_py)


def test_root_base_offsets_table(golden, monkeypatch):
    """root_base shifts the root table indexing without changing cursors."""
    g, instances = golden
    mesh_arrays = (g["indices"], g["pos"], g["normal"], g["albedo"],
                   g["material"])
    off = int(g["tlas"][1])
    subframes = [_Subframe(_Tlas(int(g["tlas"][0]), off))]
    static = WideStaticRegion(
        mesh_arrays, g["nodes"], g["links"],
        [(i.mesh, i.blas) for i in instances],
    )
    _, r0 = build_frame_tail(
        static, g["nodes"], g["links"], instances, subframes, root_base=0
    )
    _, rb = build_frame_tail(
        static, g["nodes"], g["links"], instances, subframes, root_base=off
    )
    np.testing.assert_array_equal(r0[off], rb[0])
    assert len(rb) == 1
