"""Device-resident scene: flat SoA tables as a JAX pytree.

The reference passes raw pointers to flattened buffers into the kernel
(reference: main.cc:26-38, path_tracer.hh:306-319). Here the same data is
packed into TPU-friendly SoA arrays: one 1-D table per vector component so
per-lane gathers touch dense rows, instance matrices pre-transposed into the
column layout the traversal's matrix products consume, and per-subframe
camera/light parameters as small gatherable tables (motion blur makes the
subframe a *per-ray* property, reference: path_tracer.hh:655-657).
"""

from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax.numpy as jnp

Array = Any
f32 = np.float32


class SceneDevice(NamedTuple):
    # BVH node AABBs, SoA (reference layout: bvh.hh:45-49)
    node_min_x: Array
    node_min_y: Array
    node_min_z: Array
    node_max_x: Array
    node_max_y: Array
    node_max_z: Array
    # stackless links, 8 octant tables per BVH (reference: bvh.cc:217-226)
    link_accept: Array  # int32; <0 => leaf
    link_cancel: Array
    # TLAS instances: inv_transform columns (12) + transform rot rows (9)
    inst_f: Array  # (I, 21) f32
    inst_u: Array  # (I, 4) int32: blas_count, blas_offset, index_offset, base_vertex
    # mesh buffers (reference: mesh.hh:32-44)
    tri: Array  # (K,) int32
    pos_x: Array
    pos_y: Array
    pos_z: Array
    nrm_x: Array
    nrm_y: Array
    nrm_z: Array
    alb_r: Array
    alb_g: Array
    alb_b: Array
    alb_a: Array
    mat_r: Array  # roughness
    mat_m: Array  # metallic
    mat_t: Array  # transmission
    mat_e: Array  # emission
    # per-subframe state (reference: scene.hh:26-34)
    sf_tlas_count: Array  # (S,) int32
    sf_tlas_offset: Array
    sf_cam: Array  # (S, 18) f32: orientation rows 9, position 3, aspect,
    #               inv_focal_length, focal_distance, ap_angle, ap_polygon, ap_radius
    sf_light: Array  # (S, 7) f32: direction 3, color 3, cos_solid_angle


def _instance_rows(instances):
    I = max(len(instances), 1)
    inst_f = np.zeros((I, 21), f32)
    inst_u = np.zeros((I, 4), np.int32)
    for i, inst in enumerate(instances):
        inv = inst.inv_transform.astype(f32)
        # columns 0..2 of all 4 rows: used by mul_m4v4 / mul_m3v3 forms
        # (reference: ray_query.hh:159-165)
        inst_f[i, 0:12] = inv[:, 0:3].reshape(-1)
        inst_f[i, 12:21] = inst.transform[:3, :3].astype(f32).reshape(-1)
        inst_u[i] = (
            inst.blas.node_count,
            inst.blas.node_offset,
            inst.mesh.index_offset,
            inst.mesh.base_vertex_offset,
        )
    return inst_f, inst_u


def pack_scene(
    mesh_arrays,
    bvh_nodes: np.ndarray,
    bvh_links: np.ndarray,
    instances,
    subframes,
) -> SceneDevice:
    """Pack host scene state into device arrays.

    mesh_arrays: (indices, pos, normal, albedo, material) from
    MeshBuffers.arrays(). subframes: list of scene.types.Subframe.
    """
    indices, pos, normal, albedo, material = mesh_arrays
    inst_f, inst_u = _instance_rows(instances)

    S = max(len(subframes), 1)
    sf_tlas = np.zeros((S, 2), np.int32)
    sf_cam = np.zeros((S, 18), f32)
    sf_light = np.zeros((S, 7), f32)
    for i, sf in enumerate(subframes):
        sf_tlas[i] = (sf.tlas.node_count, sf.tlas.node_offset)
        c = sf.cam
        sf_cam[i, 0:9] = np.asarray(c.orientation, f32).reshape(-1)
        sf_cam[i, 9:12] = np.asarray(c.position, f32)
        sf_cam[i, 12] = c.aspect_ratio
        sf_cam[i, 13] = c.inv_focal_length
        sf_cam[i, 14] = c.focal_distance
        sf_cam[i, 15] = c.aperture_angle
        sf_cam[i, 16] = float(c.aperture_polygon)
        sf_cam[i, 17] = c.aperture_radius
        sf_light[i, 0:3] = np.asarray(sf.light.direction, f32)
        sf_light[i, 3:6] = np.asarray(sf.light.color, f32)
        sf_light[i, 6] = sf.light.cos_solid_angle

    dev = jnp.asarray
    nodes = bvh_nodes.astype(f32)
    links = np.ascontiguousarray(bvh_links, np.uint32).view(np.int32)
    return SceneDevice(
        node_min_x=dev(nodes[:, 0]),
        node_min_y=dev(nodes[:, 1]),
        node_min_z=dev(nodes[:, 2]),
        node_max_x=dev(nodes[:, 3]),
        node_max_y=dev(nodes[:, 4]),
        node_max_z=dev(nodes[:, 5]),
        link_accept=dev(links[:, 0]),
        link_cancel=dev(links[:, 1]),
        inst_f=dev(inst_f),
        inst_u=dev(inst_u),
        tri=dev(np.ascontiguousarray(indices, np.uint32).view(np.int32)),
        pos_x=dev(pos[:, 0]),
        pos_y=dev(pos[:, 1]),
        pos_z=dev(pos[:, 2]),
        nrm_x=dev(normal[:, 0]),
        nrm_y=dev(normal[:, 1]),
        nrm_z=dev(normal[:, 2]),
        alb_r=dev(albedo[:, 0]),
        alb_g=dev(albedo[:, 1]),
        alb_b=dev(albedo[:, 2]),
        alb_a=dev(albedo[:, 3]),
        mat_r=dev(material[:, 0]),
        mat_m=dev(material[:, 1]),
        mat_t=dev(material[:, 2]),
        mat_e=dev(material[:, 3]),
        sf_tlas_count=dev(sf_tlas[:, 0]),
        sf_tlas_offset=dev(sf_tlas[:, 1]),
        sf_cam=dev(sf_cam),
        sf_light=dev(sf_light),
    )
