"""Geometry-sharded rendering — the renderer's tensor-parallel analogue.

The reference replicates its whole scene in every worker's memory (one
process, shared buffers; main.cc). SURVEY.md §2.11 calls scene *sharding*
the TP analogue for scenes larger than one chip's HBM: here each device of
a ``geom`` mesh axis owns a DISJOINT subset of the TLAS instances (and
traverses only its own acceleration structure), every device traces the
same replicated rays against its local geometry, and the global closest
hit is reconstructed with mesh collectives:

  * per-lane winner:  ``pmin`` over shard-local thit (miss -> +inf),
  * deterministic tie-break: lowest shard index among equal thit,
  * shading happens on the winning shard (its tables hold the hit's
    attributes), then the shaded ``HitInfo`` is ``psum``-combined (the
    losers contribute zeros via where-masks, so stray inf/NaN in dead
    lanes cannot leak),
  * any-hit occlusion is a ``psum`` logical OR.

After the combine, every shard carries identical hit state, so the bounce
loop (RNG, BSDF, NEE, atmosphere) stays replicated and bit-consistent —
only the two-level BVH traversal is distributed. One drain costs three
(R,) collectives plus one HitInfo psum (~22R floats) per bounce, all
riding ICI.

Work distribution: instances are assigned to shards by greedy busiest-last
bin packing on BLAS node counts, so each device traverses ~1/D of the
scene's geometry. Each shard's tables are COMPACTED to the meshes/BLASes
its instances actually reference (remapped handles, shard-local instance
ids — safe because HitInfo carries no ids, only shaded floats), so HBM
per shard scales down with 1/D: a scene too big for one chip fits a mesh.

Forward rendering only; the combine's where-masks are gradient-safe but
geometry-sharded differentiation is untested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import (
    HitInfo,
    path_trace_samples,
    shade_hit,
)
from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.scene.device import SceneDevice, pack_scene
from pathtracing_tpu.utils.vec import Mat3, Vec3

__all__ = [
    "assign_instances",
    "build_shard_scenes",
    "make_geom_query_shade",
    "make_geom_sharded_render",
]


def tlas_leaf_ids(links: np.ndarray, handle) -> np.ndarray:
    """Instance ids referenced by a TLAS: leaf-encoded accept links carry
    the user index under the 0x80000000 tag (reference: bvh.cc:176-177)."""
    block = np.asarray(
        links[8 * handle.node_offset : 8 * (handle.node_offset + handle.node_count)],
        np.uint32,
    )
    acc = block[:, 0]
    return np.unique(acc[(acc & 0x80000000) != 0] & 0x7FFFFFFF)


def assign_instances(scene, n_shards: int) -> np.ndarray:
    """Greedy balance of instances over shards by BLAS node count (unique
    BLASes counted once per shard). Returns (I,) shard index per instance."""
    insts = scene.instances
    order = sorted(
        range(len(insts)), key=lambda i: -insts[i].blas.node_count
    )
    load = np.zeros(n_shards, np.int64)
    # BLASes already resident on a shard are free for further instances
    resident = [set() for _ in range(n_shards)]
    assign = np.zeros(len(insts), np.int32)
    for i in order:
        blas_key = insts[i].blas.node_offset
        costs = [
            load[s] + (0 if blas_key in resident[s] else insts[i].blas.node_count)
            for s in range(n_shards)
        ]
        s = int(np.argmin(costs))
        assign[i] = s
        load[s] = costs[s]
        resident[s].add(blas_key)
    return assign


def _compact_shard(scene, mine: list[int]):
    """Slice the global buffers down to one shard's instances.

    Returns (mesh_arrays, bvh_nodes, bvh_links, instances, blas_of) where
    instances carry REMAPPED mesh/BLAS handles into the compacted buffers
    (transforms — including inv_transform — are shared, not recomputed, so
    traversal math is bit-identical to the single-device scene).
    """
    import dataclasses

    indices, pos, normal, albedo, material = scene.mesh_buf.arrays()

    mesh_map = {}   # (index_offset, base_vertex_offset) -> local MeshHandle
    idx_parts, v_slices = [], []
    cur_idx = cur_v = 0
    blas_map = {}   # global node_offset -> local BvhHandle
    node_parts, link_parts = [], []
    cur_n = 0
    locals_ = []
    for i in mine:
        inst = scene.instances[i]
        mkey = (inst.mesh.index_offset, inst.mesh.base_vertex_offset)
        if mkey not in mesh_map:
            m = inst.mesh
            # per-mesh index values are relative to base_vertex_offset
            # (scene/device.pack_tri_tables adds it back), so the slice
            # copies unchanged
            idx_parts.append(
                indices[m.index_offset : m.index_offset + 3 * m.triangle_count]
            )
            v_slices.append(
                slice(m.base_vertex_offset, m.base_vertex_offset + m.vertex_count)
            )
            mesh_map[mkey] = dataclasses.replace(
                m, index_offset=cur_idx, base_vertex_offset=cur_v
            )
            cur_idx += 3 * m.triangle_count
            cur_v += m.vertex_count
        bkey = inst.blas.node_offset
        if bkey not in blas_map:
            b = inst.blas
            # link node indices are BVH-local (accel/types.py layout
            # contract), so node/link blocks relocate without rewriting
            node_parts.append(scene.bvh_buf.nodes[b.node_offset : b.node_offset + b.node_count])
            link_parts.append(
                scene.bvh_buf.links[8 * b.node_offset : 8 * (b.node_offset + b.node_count)]
            )
            from pathtracing_tpu.accel.types import BvhHandle

            blas_map[bkey] = BvhHandle(node_count=b.node_count, node_offset=cur_n)
            cur_n += b.node_count
        locals_.append(
            dataclasses.replace(inst, blas=blas_map[bkey], mesh=mesh_map[mkey])
        )

    mesh_arrays = (
        np.concatenate(idx_parts).astype(np.uint32) if idx_parts
        else np.zeros((0,), np.uint32),
        *(
            np.concatenate([a[sl] for sl in v_slices]).astype(np.float32)
            if v_slices else np.zeros((0, a.shape[1]), np.float32)
            for a in (pos, normal, albedo, material)
        ),
    )
    nodes = (
        np.concatenate(node_parts).astype(np.float32)
        if node_parts else np.zeros((0, 6), np.float32)
    )
    links = (
        np.concatenate(link_parts).astype(np.uint32)
        if link_parts else np.zeros((0, 2), np.uint32)
    )
    return mesh_arrays, nodes, links, locals_


def build_shard_scenes(
    scene, config: RenderConfig, n_shards: int, assign: np.ndarray | None = None
):
    """Build one compacted SceneDevice per shard: each shard's tables hold
    only the meshes/BLASes its instances reference (shard-local instance
    ids; per-shard subframe TLASes over the shard's instance subset), so
    device memory per shard shrinks with the assignment.

    Returns (stacked SceneDevice with a leading (D, ...) axis on every
    field, assign). Tables are zero-padded to the largest shard's row count
    per field so the stacked arrays are rectangular.
    """
    from pathtracing_tpu.accel.builder_py import build_tlas
    from pathtracing_tpu.accel.types import BvhBuffers, BvhHandle
    from pathtracing_tpu.scene.types import Subframe

    if assign is None:
        assign = assign_instances(scene, n_shards)
    assign = np.asarray(assign, np.int32)

    shard_devs = []
    for s in range(n_shards):
        mine = np.nonzero(assign == s)[0].tolist()
        local_of = {int(g): l for l, g in enumerate(mine)}
        mesh_arrays, blas_nodes, blas_links, locals_ = _compact_shard(
            scene, mine
        )
        bc = BvhBuffers()
        bc.nodes, bc.links = blas_nodes, blas_links
        subframes = []
        for sf in scene.subframes:
            active = tlas_leaf_ids(scene.bvh_buf.links, sf.tlas)
            ids = [local_of[int(i)] for i in active if int(i) in local_of]
            if ids:
                handle = build_tlas(
                    [locals_[i] for i in ids], ids, bc.nodes, bc,
                )
            else:
                # empty shard for this subframe: 0-node TLAS => every ray
                # exhausts immediately (ray_query treats count 0 as done)
                handle = BvhHandle(node_offset=len(bc.nodes), node_count=0)
            subframes.append(Subframe(handle, sf.cam, sf.light))
        shard_devs.append(
            pack_scene(mesh_arrays, bc.nodes, bc.links, locals_, subframes)
        )

    # pad every field to the max shard row count and stack along axis 0
    def pad_to(a, rows):
        a = jnp.asarray(a)
        extra = rows - a.shape[0]
        if extra == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)]
        )

    fields = shard_devs[0]._fields
    stacked = {}
    for name in fields:
        vals = [getattr(d, name) for d in shard_devs]
        if vals[0] is None:
            stacked[name] = None
            continue
        rows = max(v.shape[0] for v in vals)
        stacked[name] = jnp.stack([pad_to(v, rows) for v in vals])
    return type(shard_devs[0])(**stacked), assign


def make_geom_query_shade(axis_name: str):
    """The query_shade hook (ops/integrator.path_trace_samples) that traces
    shard-local geometry and combines hits across the ``axis_name`` mesh
    axis."""

    def query_shade(
        scene, light, tlas_count, tlas_offset, org, d, tmin, tmax,
        active, anyhit, n_shade,
    ):
        hit, occ = ray_query(
            scene, tlas_count, tlas_offset, org, d, tmin, tmax, active,
            anyhit=anyhit,
        )
        n_occ = occ.shape[0] - n_shade
        occluded = (
            jax.lax.psum(occ[:n_occ].astype(jnp.float32), axis_name) > 0
        )

        tail = lambda a: a[a.shape[0] - n_shade :]
        hit_t = jax.tree.map(tail, hit)
        org_t = Vec3(tail(org.x), tail(org.y), tail(org.z))
        dir_t = Vec3(tail(d.x), tail(d.y), tail(d.z))

        # global winner: min thit (miss -> +inf), ties to the lowest shard
        key = jnp.where(hit_t.thit >= 0, hit_t.thit, jnp.inf)
        gmin = jax.lax.pmin(key, axis_name)
        idx = jax.lax.axis_index(axis_name).astype(jnp.int32)
        cand = (key == gmin) & jnp.isfinite(gmin)
        win = jax.lax.pmin(
            jnp.where(cand, idx, jnp.int32(0x7FFFFFFF)), axis_name
        )
        mask = cand & (idx == win)
        # a globally-missed lane is shaded (sun disk / sky) by shard 0 —
        # the miss value is scene-independent so any single shard works
        mask = mask | (~jnp.isfinite(gmin) & (idx == 0))

        info = shade_hit(scene, light, hit_t, org_t, dir_t)

        def keep(x):
            m = mask
            if x.dtype == jnp.bool_:
                return jnp.where(m, x, False)
            return jnp.where(m, x, jnp.zeros_like(x))

        masked = jax.tree.map(keep, info)
        # bools (none today) would need an OR; all HitInfo fields are float
        combined = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name), masked
        )
        return occluded, combined

    return query_shade


def make_geom_sharded_render(
    config: RenderConfig,
    mesh: Mesh,
    spp: int,
    axis_name: str = "geom",
    tile_axis: str | None = None,
):
    """Jitted fn(stacked_scene, xs, ys) -> (r, g, b) radiance SUMS over spp.

    stacked_scene: from build_shard_scenes (leading D axis on every field);
    xs/ys are flat pixel arrays. Every device traces its pixel shard's rays
    against its own geometry shard; hit state is bit-consistent across the
    geom axis, so outputs are replicated over it.

    tile_axis: optional second mesh axis for pixel data-parallelism — xs/ys
    are sharded over it, composing geometry-TP x pixel-DP in one mesh (the
    renderer's TPxDP analogue; reference has only the pixel loop,
    main.cc:16).
    """
    query_shade = make_geom_query_shade(axis_name)

    def _check_no_lights(scene_stacked):
        # fail at the API boundary, not from inside the bounce scan
        # (ops/integrator.py would raise the same complaint mid-trace):
        # shard scenes are packed without light tables, so area-light NEE
        # and geometry sharding cannot compose yet
        if getattr(scene_stacked, "lt_tris", None) is not None:
            raise NotImplementedError(
                "geometry sharding does not support area-light NEE scenes "
                "(pack the scene without emissive_nee, or render on the "
                "replicated-geometry path)"
            )

    def local_render(scene_stacked, xs, ys):
        scene = jax.tree.map(lambda a: a[0], scene_stacked)

        def body(acc, s):
            si = jnp.full(xs.shape, s, jnp.int32)
            c = path_trace_samples(
                config, scene, xs, ys, si, query_shade=query_shade
            )
            return (acc[0] + c.x, acc[1] + c.y, acc[2] + c.z), None

        zero = jnp.zeros(xs.shape, jnp.float32)
        (r, g, b), _ = jax.lax.scan(
            body, (zero, zero, zero), jnp.arange(spp, dtype=jnp.int32)
        )
        # the combine already replicates hit state, so (r, g, b) are equal
        # on every shard; average over the axis to declare replication
        n = jax.lax.psum(1, axis_name)
        return (
            jax.lax.psum(r, axis_name) / n,
            jax.lax.psum(g, axis_name) / n,
            jax.lax.psum(b, axis_name) / n,
        )

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        # P(axis_name) is a tree-prefix spec: every SceneDevice field is
        # sharded on its leading (D, ...) axis
        in_specs=(P(axis_name), P(tile_axis), P(tile_axis)),
        out_specs=(P(tile_axis),) * 3,
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def guarded(scene_stacked, xs, ys):
        _check_no_lights(scene_stacked)
        return jitted(scene_stacked, xs, ys)

    return guarded
