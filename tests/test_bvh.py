"""BVH builder must reproduce the reference's flattened node/link arrays
byte-for-byte (reference: bvh.cc:43-250): same SAH sweep, same BFS layout,
same 8-octant stackless links."""

import numpy as np
import pytest

from pathtracing_tpu.accel.builder_py import (
    build_from_leaves_py,
    compute_blas_leaves,
)
from pathtracing_tpu.accel.native import build_bvh_native
from pathtracing_tpu.io.obj import MeshBuffers, load_mesh
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden, require_reference_data


def _leaves(name):
    mb = MeshBuffers()
    m = load_mesh(mb, str(require_reference_data(f"{name}.obj")))
    return compute_blas_leaves(m, mb.arrays())


@pytest.mark.parametrize("name", ["rock0"])
def test_blas_python_matches_oracle(name):
    golden = load_golden(str(require_golden(f"blas_{name}.gold")))
    nodes, links = build_from_leaves_py(*_leaves(name))
    assert len(nodes) == golden["bvh"][0]
    np.testing.assert_array_equal(nodes, golden["nodes"])
    np.testing.assert_array_equal(links, golden["links"])


@pytest.mark.parametrize("name", ["rock0", "teapot"])
def test_blas_native_matches_oracle(name):
    golden = load_golden(str(require_golden(f"blas_{name}.gold")))
    out = build_bvh_native(*_leaves(name))
    if out is None:
        pytest.skip("no C++ toolchain for native builder")
    nodes, links = out
    assert len(nodes) == golden["bvh"][0]
    np.testing.assert_array_equal(nodes, golden["nodes"])
    np.testing.assert_array_equal(links, golden["links"])
