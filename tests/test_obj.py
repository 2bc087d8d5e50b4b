"""OBJ/MTL loader must reproduce the reference's mesh_buffers exactly
(reference: mesh.cc:110-265; dedup and material baking at mesh.cc:218-262)."""

import numpy as np
import pytest

from pathtracing_tpu.io.obj import MeshBuffers, load_mesh
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden, require_reference_data


@pytest.mark.parametrize("name", ["teapot", "rock2"])
@pytest.mark.parametrize("loader", ["python", "native"])
def test_mesh_matches_oracle(name, loader, monkeypatch):
    golden = load_golden(str(require_golden(f"mesh_{name}.gold")))
    obj = require_reference_data(f"{name}.obj")

    if loader == "python":
        monkeypatch.setenv("PT_NO_NATIVE", "1")
    else:
        from pathtracing_tpu.io.native_loader import _get_lib

        if _get_lib() is None:
            pytest.skip("no C++ toolchain")

    mb = MeshBuffers()
    m = load_mesh(mb, str(obj))
    indices, pos, normal, albedo, material = mb.arrays()

    vc, tc, io, bvo = golden["handle"]
    assert m.vertex_count == vc
    assert m.triangle_count == tc
    assert m.index_offset == io
    assert m.base_vertex_offset == bvo

    np.testing.assert_array_equal(indices, golden["indices"])
    np.testing.assert_array_equal(pos, golden["pos"])
    np.testing.assert_array_equal(normal, golden["normal"])
    np.testing.assert_array_equal(albedo, golden["albedo"])
    np.testing.assert_array_equal(material, golden["material"])
