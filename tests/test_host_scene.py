"""Host pipeline parity: building the golden scene through this repo's own
loader/builder/transform stack must reproduce the oracle's scene dump."""

import numpy as np
import pytest

from pathtracing_tpu.utils.goldenio import load_golden

from conftest import ASSET_DIR, REFERENCE_DATA, require_golden
from golden_scene import build_golden_scene_host


@pytest.fixture(scope="module")
def built():
    ground = ASSET_DIR / "golden" / "ground.obj"
    if not ground.exists() or not (REFERENCE_DATA / "teapot.obj").exists():
        pytest.skip("assets unavailable")
    g = load_golden(str(require_golden("scene.gold")))
    s = build_golden_scene_host(str(REFERENCE_DATA), str(ground))
    return g, s


def test_mesh_buffers_match(built):
    g, s = built
    indices, pos, normal, albedo, material = s.mesh_buf.arrays()
    np.testing.assert_array_equal(indices, g["indices"])
    np.testing.assert_array_equal(pos, g["pos"])
    np.testing.assert_array_equal(normal, g["normal"])
    np.testing.assert_array_equal(albedo, g["albedo"])
    np.testing.assert_array_equal(material, g["material"])


def test_instances_match(built):
    g, s = built
    fu, ff = g["instances_u"], g["instances_f"]
    assert len(s.instances) == len(fu)
    for i, inst in enumerate(s.instances):
        assert inst.blas.node_count == fu[i][0]
        assert inst.blas.node_offset == fu[i][1]
        assert inst.mesh.index_offset == fu[i][4]
        assert inst.mesh.base_vertex_offset == fu[i][5]
        # transforms involve sin/cos: allow transcendental ulps
        np.testing.assert_allclose(
            inst.transform.reshape(-1), ff[i][:16], rtol=3e-7, atol=3e-7
        )
        np.testing.assert_allclose(
            inst.inv_transform.reshape(-1), ff[i][16:32], rtol=3e-6, atol=3e-6
        )


def test_bvh_buffers_match(built):
    g, s = built
    # BLAS regions are pure float data through identical arithmetic => exact.
    # The TLAS region depends on instance transforms (sin/cos ulps) => the
    # tree STRUCTURE must match; AABB floats may differ in last ulps.
    tlas_offset = int(g["tlas"][1])
    np.testing.assert_array_equal(
        s.bvh_buf.nodes[:tlas_offset], g["nodes"][:tlas_offset]
    )
    np.testing.assert_array_equal(
        s.bvh_buf.links[: tlas_offset * 8], g["links"][: tlas_offset * 8]
    )
    tl = s.subframes[0].tlas
    assert tl.node_offset == tlas_offset
    assert tl.node_count == int(g["tlas"][0])
    np.testing.assert_allclose(
        s.bvh_buf.nodes[tlas_offset:], g["nodes"][tlas_offset:], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        s.bvh_buf.links[tlas_offset * 8 :], g["links"][tlas_offset * 8 :]
    )


def test_camera_light_match(built):
    g, s = built
    cam = s.subframes[0].cam
    c = g["camera"]
    np.testing.assert_allclose(
        cam.orientation.reshape(-1), c[0:9], rtol=3e-7, atol=3e-7
    )
    np.testing.assert_array_equal(cam.position, c[9:12])
    assert abs(cam.inv_focal_length - c[13]) < 3e-7
    light = s.subframes[0].light
    l = g["light"]
    np.testing.assert_allclose(light.direction, l[0:3], rtol=3e-7)
    assert abs(light.cos_solid_angle - l[6]) < 3e-7
