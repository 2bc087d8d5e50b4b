"""BVH builder must reproduce the reference's flattened node/link arrays
byte-for-byte (reference: bvh.cc:43-250): same SAH sweep, same BFS layout,
same 8-octant stackless links."""

import numpy as np
import pytest

from pathtracing_tpu.accel.builder_py import build_blas
from pathtracing_tpu.accel.types import BvhBuffers
from pathtracing_tpu.io.obj import MeshBuffers, load_mesh
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden, require_reference_data


@pytest.mark.parametrize("name", ["rock0", "teapot"])
def test_blas_matches_oracle(name):
    golden = load_golden(str(require_golden(f"blas_{name}.gold")))
    obj = require_reference_data(f"{name}.obj")

    mb = MeshBuffers()
    m = load_mesh(mb, str(obj))
    bc = BvhBuffers()
    handle = build_blas(m, mb.arrays(), bc)

    nc, no = golden["bvh"]
    assert handle.node_count == nc
    assert handle.node_offset == no
    np.testing.assert_array_equal(bc.nodes, golden["nodes"])
    np.testing.assert_array_equal(bc.links, golden["links"])
