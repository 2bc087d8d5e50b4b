"""Golden test scene helpers.

Two construction paths:
  * scene_device_from_golden(): builds a SceneDevice directly from the
    oracle's scene.gold dump — isolates device-kernel tests from the host
    pipeline.
  * build_golden_scene_host(): reconstructs the same scene through this
    repo's own loader/builder (mirrors tools/oracle/harness.cc
    build_golden_scene — keep in sync!) for host-pipeline parity tests.
"""

from __future__ import annotations

import numpy as np

from pathtracing_tpu.accel.types import BvhBuffers, BvhHandle
from pathtracing_tpu.config import TESTING
from pathtracing_tpu.io.obj import MeshBuffers, MeshHandle, load_mesh
from pathtracing_tpu.scene.device import SceneDevice, pack_scene
from pathtracing_tpu.scene.types import (
    Camera,
    DirectionalLight,
    Scene,
    Subframe,
    TlasInstance,
)
from pathtracing_tpu.utils.hostmath import (
    extract_m4m3,
    mul_m4m4,
    rotation_euler,
    scaling,
    translation,
)

f32 = np.float32


class _GoldenInstance:
    def __init__(self, fu, ff):
        self.blas = BvhHandle(node_count=int(fu[0]), node_offset=int(fu[1]))
        self.mesh = MeshHandle(
            vertex_count=int(fu[2]),
            triangle_count=int(fu[3]),
            index_offset=int(fu[4]),
            base_vertex_offset=int(fu[5]),
        )
        self.transform = ff[:16].reshape(4, 4).astype(f32)
        self.inv_transform = ff[16:32].reshape(4, 4).astype(f32)


def camera_from_golden(g) -> Camera:
    c = g["camera"]
    return Camera(
        orientation=c[0:9].reshape(3, 3),
        position=c[9:12],
        aspect_ratio=float(c[12]),
        inv_focal_length=float(c[13]),
        focal_distance=float(c[14]),
        aperture_angle=float(c[15]),
        aperture_polygon=int(c[16]),
        aperture_radius=float(c[17]),
    )


def light_from_golden(g) -> DirectionalLight:
    l = g["light"]
    return DirectionalLight(
        direction=l[0:3], color=l[3:6], cos_solid_angle=float(l[6])
    )


def scene_device_from_golden(
    g, config=TESTING, wide: bool = False, leaf_bundle: int | None = 8,
    wide_layout="w8",
) -> SceneDevice:
    instances = [
        _GoldenInstance(g["instances_u"][i], g["instances_f"][i])
        for i in range(len(g["instances_u"]))
    ]
    tlas = BvhHandle(node_count=int(g["tlas"][0]), node_offset=int(g["tlas"][1]))
    cam = camera_from_golden(g)
    light = light_from_golden(g)
    subframes = [Subframe(tlas, cam, light) for _ in range(config.subframe_count)]
    mesh_arrays = (
        g["indices"],
        g["pos"],
        g["normal"],
        g["albedo"],
        g["material"],
    )
    return pack_scene(
        mesh_arrays, g["nodes"], g["links"], instances, subframes,
        wide=wide, leaf_bundle=leaf_bundle, wide_layout=wide_layout,
    )


# ---------------------------------------------------------------------------
# Host-pipeline mirror of tools/oracle/harness.cc::build_golden_scene
# ---------------------------------------------------------------------------

GOLDEN_INSTANCES = [
    # (mesh name, pos, pitch/yaw/roll deg, scale)
    ("ground", (0, 0, 0), (0, 0, 0), (1, 1, 1)),
    ("teapot", (0, 0.0, 0), (0, 30, 0), (1, 1, 1)),
    ("rock0", (-3, 0, -1), (0, 70, 0), (1, 1, 1)),
    ("rock1", (2.5, 0, -2), (0, 140, 0), (2, 2, 2)),
    ("rock2", (4, 0, 3), (0, 200, 0), (1.5, 1.5, 1.5)),
    ("rock3", (-2.5, 0, 3.5), (10, 290, 0), (1, 1, 1)),
    ("rock4", (0.5, 0, -5), (0, 15, 0), (3, 3, 3)),
]


def make_transform(pos, pyr_deg, scale) -> np.ndarray:
    """reference: scene.cc:62-73."""
    t = scaling(np.asarray(scale, f32))
    rot = rotation_euler(
        (np.asarray(pyr_deg, f32) * f32(np.pi) / f32(180.0)).astype(f32)
    )
    t = mul_m4m4(rot, t)
    return mul_m4m4(translation(np.asarray(pos, f32)), t)


def build_golden_scene_host(data_dir, ground_obj, config=TESTING) -> Scene:
    from pathtracing_tpu.accel.builder_py import build_blas, build_tlas

    s = Scene()
    mesh_files = {
        "ground": str(ground_obj),
        "teapot": f"{data_dir}/teapot.obj",
        "rock0": f"{data_dir}/rock0.obj",
        "rock1": f"{data_dir}/rock1.obj",
        "rock2": f"{data_dir}/rock2.obj",
        "rock3": f"{data_dir}/rock3.obj",
        "rock4": f"{data_dir}/rock4.obj",
    }
    for name, path in mesh_files.items():
        m = load_mesh(s.mesh_buf, path)
        blas = build_blas(m, s.mesh_buf.arrays(), s.bvh_buf)
        s.meshes[name] = (m, blas)

    for name, pos, pyr, scale in GOLDEN_INSTANCES:
        m, blas = s.meshes[name]
        s.instances.append(
            TlasInstance.create(blas, m, make_transform(pos, pyr, scale))
        )

    tlas = build_tlas(
        s.instances, list(range(len(s.instances))), s.bvh_buf.nodes, s.bvh_buf
    )

    cam = Camera(
        orientation=extract_m4m3(
            rotation_euler(
                (np.array([16.0, 327.5, 0.0], f32) * f32(np.pi) / f32(180.0)).astype(f32)
            )
        ),
        position=np.array([7.0, 4.5, 11.0], f32),
        aspect_ratio=config.image_width / float(config.image_height),
        inv_focal_length=float(f32(np.tan(f32(60.0 * np.pi / 360.0)))),
        focal_distance=2.0,
        aperture_angle=float(f32(np.pi / 16.0)),
        aperture_polygon=6,
        aperture_radius=0.0,
    )
    direction = np.array([0, 1, 1], f32)
    direction = direction / f32(np.sqrt(2.0))
    light = DirectionalLight(
        direction=direction.astype(f32),
        color=np.array([4, 4, 4], f32),
        cos_solid_angle=float(f32(np.cos(f32(4.0 * np.pi / 180.0)))),
    )
    s.subframes = [Subframe(tlas, cam, light) for _ in range(config.subframe_count)]
    s.static_instance_count = len(s.instances)
    return s


def scene_device_from_motion_golden(g) -> SceneDevice:
    """Build a SceneDevice from the harness 'motion' dump (distinct
    subframes: moving teapot + moving sun; prefix mb_)."""
    from pathtracing_tpu.scene.device import (
        _instance_rows,
        pack_nl8,
        pack_tri_tables,
        pack_vattr,
    )
    import jax.numpy as jnp

    instances = [
        _GoldenInstance(g["mb_instances_u"][i], g["mb_instances_f"][i])
        for i in range(len(g["mb_instances_u"]))
    ]
    inst_f, inst_u = _instance_rows(instances)
    segments = [(i.blas.node_offset, i.blas.node_count) for i in instances]
    segments += [(int(o), int(c)) for c, o in g["mb_sf_tlas"]]
    tri_pos, tri_idx = pack_tri_tables(
        g["mb_indices"], g["mb_pos"], [i.mesh for i in instances]
    )
    dev = jnp.asarray
    return SceneDevice(
        nl8=dev(pack_nl8(g["mb_nodes"], g["mb_links"], segments)),
        tri_pos=dev(tri_pos),
        tri_idx=dev(tri_idx),
        inst_f=dev(inst_f),
        inst_u=dev(inst_u),
        vattr=dev(pack_vattr(g["mb_normal"], g["mb_albedo"], g["mb_material"])),
        sf_tlas_count=dev(g["mb_sf_tlas"][:, 0].astype(np.int32)),
        sf_tlas_offset=dev(g["mb_sf_tlas"][:, 1].astype(np.int32)),
        sf_cam=dev(g["mb_sf_cam"]),
        sf_light=dev(g["mb_sf_light"]),
    )
