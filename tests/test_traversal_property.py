"""Property test: traversal on random scenes vs brute-force intersection.

The golden tests pin the oracle scene; this pins the *algorithm*: for random
triangle soups under random instance transforms, the BVH traversal must
find the same closest hit as a vectorized brute-force test over every
world-space triangle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.accel.builder_py import build_blas, build_tlas
from pathtracing_tpu.accel.types import BvhBuffers
from pathtracing_tpu.io.obj import MeshHandle
from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.scene.device import pack_scene
from pathtracing_tpu.scene.types import Camera, DirectionalLight, Subframe, TlasInstance
from pathtracing_tpu.utils.hostmath import mul_m4m4, rotation_euler, scaling, translation
from pathtracing_tpu.utils.vec import Vec3

f32 = np.float32


def _random_mesh(rng, n_tris, extent=1.0):
    """Disjoint-ish small triangles scattered in a unit-ish volume."""
    centers = rng.uniform(-extent, extent, (n_tris, 3)).astype(f32)
    tris = (
        centers[:, None, :]
        + rng.uniform(-0.08, 0.08, (n_tris, 3, 3)).astype(f32)
    )
    pos = tris.reshape(-1, 3)
    indices = np.arange(n_tris * 3, dtype=np.uint32)
    v = len(pos)
    normal = np.tile(np.array([0, 1, 0], f32), (v, 1))
    albedo = np.ones((v, 4), f32)
    material = np.ones((v, 4), f32)
    return indices, pos, normal, albedo, material


def _build_scene(rng, n_meshes=3, n_instances=6, tris_per_mesh=64):
    chunks = [_random_mesh(rng, tris_per_mesh) for _ in range(n_meshes)]
    indices = []
    pos, normal, albedo, material = [], [], [], []
    handles = []
    io = 0
    bv = 0
    for c in chunks:
        handles.append(
            MeshHandle(
                vertex_count=len(c[1]),
                triangle_count=len(c[0]) // 3,
                index_offset=io,
                base_vertex_offset=bv,
            )
        )
        indices.append(c[0])
        pos.append(c[1])
        normal.append(c[2])
        albedo.append(c[3])
        material.append(c[4])
        io += len(c[0])
        bv += len(c[1])
    mesh_arrays = (
        np.concatenate(indices),
        np.concatenate(pos),
        np.concatenate(normal),
        np.concatenate(albedo),
        np.concatenate(material),
    )

    bc = BvhBuffers()
    blas = [build_blas(h, mesh_arrays, bc) for h in handles]

    instances = []
    for i in range(n_instances):
        m = rng.integers(0, n_meshes)
        t = scaling(rng.uniform(0.5, 2.0, 3).astype(f32))
        t = mul_m4m4(rotation_euler(rng.uniform(0, 2 * np.pi, 3).astype(f32)), t)
        t = mul_m4m4(translation(rng.uniform(-3, 3, 3).astype(f32)), t)
        instances.append(TlasInstance.create(blas[m], handles[m], t))

    tlas = build_tlas(instances, list(range(n_instances)), bc.nodes, bc)
    sub = Subframe(
        tlas,
        Camera(np.eye(3, dtype=f32), np.zeros(3, f32), 1.0, 1.0, 1.0, 0.0, 0, 0.0),
        DirectionalLight(np.array([0, 1, 0], f32), np.ones(3, f32), 0.5),
    )
    scene = pack_scene(mesh_arrays, bc.nodes, bc.links, instances, [sub])
    return scene, tlas, instances, handles, mesh_arrays


def _world_triangles(instances, handles, mesh_arrays):
    """All instance triangles transformed to world space: (M, 3, 3)."""
    indices, pos = mesh_arrays[0], mesh_arrays[1]
    out = []
    ids = []
    for inst_id, inst in enumerate(instances):
        m = inst.mesh
        tri = indices[m.index_offset : m.index_offset + 3 * m.triangle_count]
        p = pos[m.base_vertex_offset + tri].reshape(-1, 3, 3)
        # world = mul_m4v4(transform, [p,1]) = transform^T @ [p,1]
        hom = np.concatenate([p, np.ones((*p.shape[:2], 1), f32)], -1)
        world = hom @ inst.transform.astype(np.float64)  # (T,3,4) rows x mat
        out.append(world[..., :3].astype(np.float64))
        ids.extend((inst_id, prim) for prim in range(m.triangle_count))
    return np.concatenate(out), ids


def _brute_force(world_tris, org, d):
    """Möller-Trumbore closest-hit in float64 over all triangles."""
    v0 = world_tris[:, 0]
    e1 = world_tris[:, 1] - v0
    e2 = world_tris[:, 2] - v0
    n_rays = len(org)
    best_t = np.full(n_rays, np.inf)
    best_i = np.full(n_rays, -1)
    for r in range(n_rays):
        o, dd = org[r].astype(np.float64), d[r].astype(np.float64)
        p = np.cross(dd, e2)
        det = np.einsum("ij,ij->i", e1, p)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            tvec = o - v0
            u = np.einsum("ij,ij->i", tvec, p) * inv
            q = np.cross(tvec, e1)
            v = np.einsum("ij,ij->i", q, np.broadcast_to(dd, e1.shape)) * inv
            t = np.einsum("ij,ij->i", e2, q) * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        t = np.where(ok, t, np.inf)
        i = int(np.argmin(t))
        if np.isfinite(t[i]):
            best_t[r] = t[i]
            best_i[r] = i
    return best_t, best_i


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_scene_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    scene, tlas, instances, handles, mesh_arrays = _build_scene(rng)
    world_tris, ids = _world_triangles(instances, handles, mesh_arrays)

    n = 256
    org = rng.uniform(-5, 5, (n, 3)).astype(f32)
    d = rng.normal(size=(n, 3)).astype(f32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(f32)

    tlc = jnp.full(n, tlas.node_count, jnp.int32)
    tlo = jnp.full(n, tlas.node_offset, jnp.int32)
    hit, _ = ray_query(
        scene,
        tlc,
        tlo,
        Vec3(*(jnp.asarray(org[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
        0.0,
        1e9,
        jnp.ones(n, bool),
    )

    bf_t, bf_i = _brute_force(world_tris, org, d)
    got_t = np.asarray(hit.thit).astype(np.float64)
    got_hit = got_t >= 0
    ref_hit = np.isfinite(bf_t)

    # grazing-edge cases may differ; require near-total agreement
    agree = got_hit == ref_hit
    assert agree.mean() > 0.99, agree.mean()

    both = got_hit & ref_hit & agree
    np.testing.assert_allclose(got_t[both], bf_t[both], rtol=2e-3, atol=2e-3)

    # the vast majority of closest hits must agree on (instance, prim);
    # the remainder are t-ties between overlapping random triangles
    matches = sum(
        1
        for r in np.nonzero(both)[0]
        if int(np.asarray(hit.inst)[r]) == ids[bf_i[r]][0]
        and int(np.asarray(hit.prim)[r]) == ids[bf_i[r]][1]
    )
    assert matches >= 0.98 * both.sum(), (matches, both.sum())
