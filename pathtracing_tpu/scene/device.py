"""Device-resident scene: row-gatherable tables as a JAX pytree.

The reference passes raw pointers to flattened buffers into the kernel
(reference: main.cc:26-38, path_tracer.hh:306-319). On TPU the deciding
constraint is the gather unit: row gathers from (N, W) tables stream at
HBM bandwidth while per-element gathers from 1-D tables crawl (measured
865 GB/s vs 5 GB/s on v5e). Every hot lookup is therefore packed into one
row:

  nl8     (8N, 8)  node AABB + {accept, cancel} fused per (octant, node),
                   indexed by the link index (reference layout bvh.cc:217-226)
  tri_pos (T, 12)  triangle vertex positions by global triangle id
  inst_f  (I, 21)  inv_transform columns (12) + rotation rows (9)
  inst_u  (I, 6)   blas count/offset, index_offset, base_vertex, tri_offset
  vattr   (V, 12)  normal(3) + albedo(4) + material(4) + pad
  sf_*    (S, _)   per-subframe TLAS handle, camera, light rows
"""

from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp


def _concat_rows_bitsafe(static_dev, tail_host: np.ndarray):
    """Concatenate a device-resident f32 table with a host tail WITHOUT an
    f32 concat: XLA:TPU's big-buffer f32 concatenate flushes SUBNORMALS to
    zero (measured on v5e, BENCH_NOTES round 3), and these tables carry
    uint32 link/cursor bit patterns viewed as f32 — small row ids are
    subnormal patterns. Concatenating in int32 space is bit-exact."""
    si = jax.lax.bitcast_convert_type(static_dev, jnp.int32)
    ti = jnp.asarray(np.ascontiguousarray(tail_host, np.float32).view(np.int32))
    return jax.lax.bitcast_convert_type(
        jnp.concatenate([si, ti]), jnp.float32
    )

Array = Any
f32 = np.float32


class SceneDevice(NamedTuple):
    nl8: Array        # (8N, 8) f32; cols 6,7 are int32 bit patterns
    tri_pos: Array    # (T, 12) f32
    tri_idx: Array    # (T, 4) int32 — absolute vertex ids [i0,i1,i2,pad]
    inst_f: Array     # (I, 21) f32
    inst_u: Array     # (I, 6) int32
    vattr: Array      # (V, 12) f32
    sf_tlas_count: Array  # (S,) int32
    sf_tlas_offset: Array
    sf_cam: Array     # (S, 18) f32
    sf_light: Array   # (S, 7) f32
    # Optional bf16-compressed node table (see pack_nl5): 20 B rows instead
    # of 32 B on the traversal's hottest gather. When present the traversal
    # reads it instead of nl8; results stay bit-identical (outward-rounded
    # bounds only widen the accept set; the exact triangle confirm rejects
    # the extras). None = disabled.
    nl5: Array | None = None
    # Optional wide-BVH mega-table (accel/wide.py): when present, traversal
    # uses ops/wide_traversal.py — one 192 B row gather per step instead of
    # the binary octant-link walk. Results are bit-identical (the wide tree
    # is a DFS-order-preserving collapse of the same binary tree).
    wide_rows: Array | None = None   # (M, W) f32 mega-table
    wide_root: Array | None = None   # (K, 8) int32 per-octant root cursors,
    #                                  indexed by tlas_offset - wide_root_base
    wide_root_base: Array | None = None  # int32 scalar (None = 0): lets the
    #                                  frame packer ship a root table covering
    #                                  only the per-frame TLAS tail
    # Optional packed per-triangle shading rows (pack_tri_shade): one 192 B
    # gather replaces tri_idx + 3x vattr + tri_pos (5 gathers) in the
    # forward-only renderers (shade_hit packed=True). The scan/diff path
    # keeps the per-vertex tables so gradients land on vattr/tri_pos.
    tri_shade: Array | None = None   # (T, 48) f32
    # Optional emissive-light tables (ops/arealights.py, enabled by
    # pack_scene(..., emissive_nee=True)): presence switches the integrator
    # to area-light NEE + MIS-weighted emission (a different, documented RNG
    # stream — defaults stay bit-faithful to the reference).
    lt_tris: Array | None = None   # (L, 9) world-space emissive triangles
    lt_rows: Array | None = None   # (L,) global tri-table row per light
    lt_cdf: Array | None = None    # (L,) inclusive area prefix sum
    lt_seg: Array | None = None    # (I,) first light row per instance or -1
    lt_rank: Array | None = None   # (T,) emissive rank per triangle or -1
    # Optional hot-row table (accel/hotperm.py): a copy of mega-table rows
    # [0, H) — the hottest-gathered rows, moved there by a pack-time
    # permutation. hot_planes is the SAME data as four -128-biased int8
    # byte planes, which the traversal's hot-advance micro-steps fetch via
    # a bit-exact one-hot MXU matmul (~4 ns/lane at H=1024 vs ~51 for a
    # wide_rows gather; per-lane gathers on even a sub-MB side table run
    # ~50-80 ns INSIDE the production kernel — staging-budget contention +
    # duplicate serialization — so the matmul is the only fast hot path;
    # BENCH_NOTES round 5). hot_rows stays for tests/diagnostics.
    hot_rows: Array | None = None    # (H, W) f32
    hot_planes: Array | None = None  # (H, 4W) int8


def _hot_byte_planes(rows_f32: np.ndarray) -> np.ndarray:
    """(H, W) f32 rows -> (H, 4W) int8: the rows' u32 words split into four
    byte planes, each biased by -128 so it fits int8. Operand of the
    bit-exact one-hot MXU fetch (ops/wide_traversal._onehot_row)."""
    u = np.ascontiguousarray(rows_f32, f32).view(np.uint32)
    planes = [
        (((u >> (8 * b)) & 0xFF).astype(np.int32) - 128).astype(np.int8)
        for b in range(4)
    ]
    return np.concatenate(planes, axis=1)


def _round_bf16_down(x: np.ndarray) -> np.ndarray:
    """Largest bf16 <= x, as f32 bit patterns >> 16 (uint32)."""
    bits = np.ascontiguousarray(x, f32).view(np.uint32)
    inexact = (bits & np.uint32(0xFFFF)) != 0
    trunc = bits >> 16
    neg = (bits >> 31).astype(bool)
    # toward zero == down for x>0; for x<0 grow the magnitude when inexact
    return trunc + (inexact & neg).astype(np.uint32)


def _round_bf16_up(x: np.ndarray) -> np.ndarray:
    """Smallest bf16 >= x, as f32 bit patterns >> 16 (uint32)."""
    bits = np.ascontiguousarray(x, f32).view(np.uint32)
    inexact = (bits & np.uint32(0xFFFF)) != 0
    trunc = bits >> 16
    neg = (bits >> 31).astype(bool)
    return trunc + (inexact & ~neg).astype(np.uint32)


def pack_nl5(nl8: np.ndarray) -> np.ndarray:
    """Compress an nl8 table to (8N, 5): bf16 AABB pairs + the two links.

    Columns 0-2 each hold two bf16 halves (value-preserving in the high 16
    bits of an f32): [min.x|min.y, min.z|max.x, max.y|max.z]. min is rounded
    toward -inf, max toward +inf, so every bf16 box contains its f32 box.
    Columns 3-4 are the accept/cancel bit patterns unchanged.
    """
    nl8 = np.asarray(nl8, f32)
    lo = _round_bf16_down(nl8[:, 0:3])   # min.xyz
    hi = _round_bf16_up(nl8[:, 3:6])     # max.xyz
    six = np.concatenate([lo, hi], axis=1)  # minx miny minz maxx maxy maxz
    out = np.zeros((len(nl8), 5), f32)
    packed = (six[:, 0::2] << 16) | six[:, 1::2]
    out[:, 0:3] = packed.view(f32)
    out[:, 3:5] = nl8[:, 6:8]
    return out


def with_bf16_nodes(scene: "SceneDevice") -> "SceneDevice":
    """Returns a copy of the scene with the compressed node table attached."""
    return scene._replace(nl5=jnp.asarray(pack_nl5(np.asarray(scene.nl8))))


def _instance_rows(instances, pad_to: int = 1):
    I = max(len(instances), pad_to, 1)
    inst_f = np.zeros((I, 21), f32)
    inst_u = np.zeros((I, 6), np.int32)
    for i, inst in enumerate(instances):
        inv = inst.inv_transform.astype(f32)
        # columns 0..2 of all 4 rows (used by mul_m4v4/mul_m3v3 forms,
        # reference: ray_query.hh:159-165)
        inst_f[i, 0:12] = inv[:, 0:3].reshape(-1)
        inst_f[i, 12:21] = inst.transform[:3, :3].astype(f32).reshape(-1)
        inst_u[i, 0:5] = (
            inst.blas.node_count,
            inst.blas.node_offset,
            inst.mesh.index_offset,
            inst.mesh.base_vertex_offset,
            inst.mesh.index_offset // 3,
        )
    return inst_f, inst_u


def pack_nl8(bvh_nodes, bvh_links, segments) -> np.ndarray:
    """Fused node+link rows for every traversable BVH segment.

    segments: iterable of (node_offset, node_count). Rows of BVHs that are
    never traversed are left zero (never read).
    """
    nodes = bvh_nodes.astype(f32)
    links_bits = np.ascontiguousarray(bvh_links, np.uint32).view(f32)
    out = np.zeros((8 * len(nodes), 8), f32)
    seen = set()
    for offset, count in segments:
        if count == 0 or (offset, count) in seen:
            continue
        seen.add((offset, count))
        block = slice(8 * offset, 8 * offset + 8 * count)
        out[block, 0:6] = np.tile(nodes[offset : offset + count], (8, 1))
        out[block, 6:8] = links_bits[block]
    return out


def pack_tri_tables(indices, pos, meshes):
    """(T, 12) packed triangle vertices + (T, 4) absolute vertex ids,
    both in global triangle order (index_offset/3 + prim).

    meshes: iterable of MeshHandle covering the triangles that can be hit.
    """
    t_total = max(len(indices) // 3, 1)
    out_pos = np.zeros((t_total, 12), f32)
    out_idx = np.zeros((t_total, 4), np.int32)
    seen = set()
    for m in meshes:
        key = (m.index_offset, m.triangle_count)
        if m.triangle_count == 0 or key in seen:
            continue
        seen.add(key)
        tri = indices[
            m.index_offset : m.index_offset + 3 * m.triangle_count
        ].reshape(-1, 3).astype(np.int64) + m.base_vertex_offset
        p = pos[tri]  # (t, 3, 3)
        t0 = m.index_offset // 3
        out_pos[t0 : t0 + m.triangle_count, 0:9] = p.reshape(-1, 9)
        out_idx[t0 : t0 + m.triangle_count, 0:3] = tri
    return out_pos, out_idx


def pack_tri_shade(indices, pos, normal, albedo, material, meshes):
    """(T, 48) packed shading rows in global triangle order: per vertex
    [normal(3), albedo(4), material(4)] (33 f32) then the 9 vertex
    positions; one row gather serves a whole hit's shading fetch."""
    t_total = max(len(indices) // 3, 1)
    out = np.zeros((t_total, 48), f32)
    seen = set()
    for m in meshes:
        key = (m.index_offset, m.triangle_count)
        if m.triangle_count == 0 or key in seen:
            continue
        seen.add(key)
        tri = indices[
            m.index_offset : m.index_offset + 3 * m.triangle_count
        ].reshape(-1, 3).astype(np.int64) + m.base_vertex_offset
        t0 = m.index_offset // 3
        sl = slice(t0, t0 + m.triangle_count)
        for v in range(3):
            base = 11 * v
            out[sl, base : base + 3] = normal[tri[:, v]]
            out[sl, base + 3 : base + 7] = albedo[tri[:, v]]
            out[sl, base + 7 : base + 11] = material[tri[:, v]]
        out[sl, 33:42] = pos[tri].reshape(-1, 9)
    return out


def pack_vattr(normal, albedo, material) -> np.ndarray:
    v = max(len(normal), 1)
    out = np.zeros((v, 12), f32)
    if len(normal):
        out[:, 0:3] = normal
        out[:, 3:7] = albedo
        out[:, 7:11] = material
    return out


def _wide_layout(name):
    from pathtracing_tpu.accel.wide import LAYOUT_S8, LAYOUT_W8, LAYOUT_W16

    if not isinstance(name, str):
        return name
    return {"w8": LAYOUT_W8, "w16": LAYOUT_W16, "s8": LAYOUT_S8}[name]


def attach_wide(
    scene: "SceneDevice",
    mesh_arrays,
    bvh_nodes,
    bvh_links,
    instances,
    subframes,
    leaf_bundle: int | None = 8,
    layout="w8",
) -> "SceneDevice":
    """Attach the wide-BVH mega-table (accel/wide.py) to a packed scene."""
    from pathtracing_tpu.accel.wide import build_wide_tables

    mega, root_by_off = build_wide_tables(
        mesh_arrays, bvh_nodes, bvh_links, instances, subframes,
        leaf_bundle=leaf_bundle, layout=_wide_layout(layout),
    )
    return scene._replace(
        wide_rows=jnp.asarray(mega), wide_root=jnp.asarray(root_by_off)
    )


def pack_scene(
    mesh_arrays,
    bvh_nodes: np.ndarray,
    bvh_links: np.ndarray,
    instances,
    subframes,
    emissive_nee: bool = False,
    wide: bool = False,
    leaf_bundle: int | None = 8,
    wide_layout="w8",
) -> SceneDevice:
    """Pack host scene state into device arrays.

    mesh_arrays: (indices, pos, normal, albedo, material) from
    MeshBuffers.arrays(). subframes: list of scene.types.Subframe.
    emissive_nee=True additionally builds the area-light NEE tables
    (ops/arealights.py) — the integrator auto-enables light sampling when
    they are present (opt-in: it changes the RNG stream).
    """
    indices, pos, normal, albedo, material = mesh_arrays
    inst_f, inst_u = _instance_rows(instances)

    lt = {}
    if emissive_nee:
        from pathtracing_tpu.ops.arealights import build_light_table

        table = build_light_table(mesh_arrays, instances)
        if table is not None:
            lt = {k: jnp.asarray(v) for k, v in table.items()}

    segments = [(i.blas.node_offset, i.blas.node_count) for i in instances]
    segments += [(sf.tlas.node_offset, sf.tlas.node_count) for sf in subframes]

    sf_tlas, sf_cam, sf_light = _subframe_rows(subframes)

    tri_pos, tri_idx = pack_tri_tables(
        indices, pos, [i.mesh for i in instances]
    )
    dev = jnp.asarray
    scene = SceneDevice(
        nl8=dev(pack_nl8(bvh_nodes, bvh_links, segments)),
        tri_pos=dev(tri_pos),
        tri_idx=dev(tri_idx),
        inst_f=dev(inst_f),
        inst_u=dev(inst_u),
        vattr=dev(pack_vattr(normal, albedo, material)),
        sf_tlas_count=dev(sf_tlas[:, 0]),
        sf_tlas_offset=dev(sf_tlas[:, 1]),
        sf_cam=dev(sf_cam),
        sf_light=dev(sf_light),
        **lt,
    )
    if wide:
        scene = attach_wide(
            scene, mesh_arrays, bvh_nodes, bvh_links, instances, subframes,
            leaf_bundle=leaf_bundle, layout=wide_layout,
        )
        scene = scene._replace(
            tri_shade=dev(
                pack_tri_shade(
                    indices, pos, normal, albedo, material,
                    [i.mesh for i in instances],
                )
            )
        )
    return scene


def _subframe_rows(subframes):
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
    return sf_tlas, sf_cam, sf_light


class DevicePacker:
    """Incremental frame packing for the animated scene.

    The mesh/BLAS region of the buffers is immutable after load_scene; only
    the per-frame TLAS tail, the instance list, and the subframe rows
    change (reference: scene.cc:271-718). The static tables are uploaded
    once; per frame only the small tail is packed and concatenated
    on-device.
    """

    # shape-stability buckets: per-frame tails/tables are padded up to these
    # multiples so every animation frame reuses ONE compiled kernel (tail
    # sizes wobble frame-to-frame with the visible-instance set).
    _NODE_BUCKET = 256     # binary-node tail granularity (nl8 rows = 8x)
    _WIDE_BUCKET = 256     # mega-table tail rows
    _ROOT_BUCKET = 64      # wide_root rows (indexed by tlas node_offset)
    _INST_BUCKET = 8       # instance rows

    def __init__(self, scene, wide: bool = False, leaf_bundle: int | None = 8,
                 wide_layout="w8", chunk_max: int | None = None,
                 octants: int = 8, hot_rows: int = 0,
                 hot_score=None, bake_static: bool = False):
        mesh_arrays = scene.mesh_buf.arrays()
        indices, pos, normal, albedo, material = mesh_arrays
        blas_segments = [
            (blas.node_offset, blas.node_count)
            for (_, blas) in scene.meshes.values()
        ]
        # static region = the BLAS span; any subframe TLAS tail present at
        # construction time is excluded (it is re-packed per frame)
        self._static_node_count = max(
            (off + cnt for off, cnt in blas_segments), default=0
        )
        n = self._static_node_count
        self._static_nl8 = jnp.asarray(
            pack_nl8(
                scene.bvh_buf.nodes[:n],
                scene.bvh_buf.links[: 8 * n],
                blas_segments,
            )
        )
        meshes = [m for (m, _) in scene.meshes.values()]
        tri_pos, tri_idx = pack_tri_tables(indices, pos, meshes)
        self._tri_pos = jnp.asarray(tri_pos)
        self._tri_idx = jnp.asarray(tri_idx)
        self._vattr = jnp.asarray(pack_vattr(normal, albedo, material))

        self._wide_static = None
        self._chunked = False
        if wide:
            if chunk_max:
                # Chunked fast path (accel/chunks.py): instance-split
                # static TLAS built once here; per-frame tails carry only
                # the dynamic instances. Traversal format is identical.
                from pathtracing_tpu.accel.chunks import ChunkedStaticRegion

                self._wide_static = ChunkedStaticRegion(
                    mesh_arrays,
                    scene.bvh_buf.nodes[:n],
                    scene.bvh_buf.links[: 8 * n],
                    list(scene.meshes.values()),
                    scene.instances[: scene.static_instance_count],
                    leaf_bundle=leaf_bundle,
                    layout=_wide_layout(wide_layout),
                    chunk_max=chunk_max,
                    octants=octants,
                    bake_static=bake_static,
                )
                self._chunked = True
            else:
                from pathtracing_tpu.accel.wide import WideStaticRegion

                self._wide_static = WideStaticRegion(
                    mesh_arrays,
                    scene.bvh_buf.nodes[:n],
                    scene.bvh_buf.links[: 8 * n],
                    list(scene.meshes.values()),
                    leaf_bundle=leaf_bundle,
                    layout=_wide_layout(wide_layout),
                )
            self._hot_dev = None
            if hot_rows:
                # Hot-row permutation (accel/hotperm.py): top-scored rows
                # move to [0, hot_rows) so the traversal's hot test is
                # ``row < H`` and the hot table is a prefix copy. Chunked
                # regions only (the plain WideStaticRegion predates the
                # chunk TLAS and has no root map to rewrite).
                if not self._chunked:
                    raise ValueError("hot_rows needs chunk_max (chunked "
                                     "static region)")
                from pathtracing_tpu.accel.hotperm import (
                    apply_hot_permutation,
                )

                apply_hot_permutation(
                    self._wide_static, hot_rows, score=hot_score
                )
                H = self._wide_static.hot_count
                self._hot_dev = jnp.asarray(
                    np.ascontiguousarray(self._wide_static.rows[:H])
                )
                self._hot_planes_dev = jnp.asarray(
                    _hot_byte_planes(self._wide_static.rows[:H])
                )
            self._wide_static_dev = jnp.asarray(self._wide_static.rows)
            self._tri_shade = jnp.asarray(
                pack_tri_shade(indices, pos, normal, albedo, material, meshes)
            )

    @staticmethod
    def _bucket(n: int, b: int) -> int:
        return -(-max(n, 1) // b) * b

    def pack_frame(self, scene) -> SceneDevice:
        """Pack the current frame state (after setup_animation_frame)."""
        n_static = self._static_node_count
        nodes = scene.bvh_buf.nodes
        links = scene.bvh_buf.links
        tail_nodes = len(nodes) - n_static
        if tail_nodes > 0:
            # tail rows live at link indices >= 8*n_static; build only them.
            # Padded to _NODE_BUCKET so the nl8 shape is frame-stable; pad
            # rows are zero and unreachable (no link targets them).
            tail_cap = self._bucket(tail_nodes, self._NODE_BUCKET)
            tail = np.zeros((8 * tail_cap, 8), f32)
            tail_links = np.ascontiguousarray(
                links[8 * n_static :], np.uint32
            ).view(f32)
            for sf in scene.subframes:
                off, cnt = sf.tlas.node_offset, sf.tlas.node_count
                if cnt == 0:
                    continue
                lo = 8 * off - 8 * n_static
                tail[lo : lo + 8 * cnt, 0:6] = np.tile(
                    nodes[off : off + cnt], (8, 1)
                )
                tail[lo : lo + 8 * cnt, 6:8] = tail_links[lo : lo + 8 * cnt]
            nl8 = _concat_rows_bitsafe(self._static_nl8, tail)
        else:
            nl8 = self._static_nl8

        inst_f, inst_u = _instance_rows(
            scene.instances,
            pad_to=self._bucket(len(scene.instances), self._INST_BUCKET),
        )
        sf_tlas, sf_cam, sf_light = _subframe_rows(scene.subframes)
        dev = jnp.asarray
        out = SceneDevice(
            nl8=nl8,
            tri_pos=self._tri_pos,
            tri_idx=self._tri_idx,
            inst_f=dev(inst_f),
            inst_u=dev(inst_u),
            vattr=self._vattr,
            sf_tlas_count=dev(sf_tlas[:, 0]),
            sf_tlas_offset=dev(sf_tlas[:, 1]),
            sf_cam=dev(sf_cam),
            sf_light=dev(sf_light),
        )
        if self._wide_static is not None:
            from pathtracing_tpu.accel.wide import END_TLAS, build_frame_tail

            if self._chunked:
                from pathtracing_tpu.accel.chunks import (
                    build_frame_tail_chunked,
                )

                tail_rows, root_by_off = build_frame_tail_chunked(
                    self._wide_static, scene.instances, scene.subframes,
                    scene.subframe_entries,
                    (scene.static_instance_count, scene.frame_static_end),
                    scene.static_instance_count, root_base=n_static,
                )
            else:
                tail_rows, root_by_off = build_frame_tail(
                    self._wide_static, nodes, links, scene.instances,
                    scene.subframes, root_base=n_static,
                )
            cap = self._bucket(len(tail_rows), self._WIDE_BUCKET)
            if len(tail_rows) < cap:
                tail_rows = np.concatenate(
                    [tail_rows, np.zeros((cap - len(tail_rows), tail_rows.shape[1]), f32)]
                )
            rcap = self._bucket(len(root_by_off), self._ROOT_BUCKET)
            if len(root_by_off) < rcap:
                pad = np.full(
                    (rcap - len(root_by_off), 8), END_TLAS, np.uint32
                ).view(np.int32)
                root_by_off = np.concatenate([root_by_off, pad])
            out = out._replace(
                wide_rows=_concat_rows_bitsafe(
                    self._wide_static_dev, tail_rows
                ),
                wide_root=jnp.asarray(root_by_off),
                wide_root_base=jnp.int32(n_static),
                tri_shade=self._tri_shade,
                hot_rows=getattr(self, "_hot_dev", None),
                hot_planes=getattr(self, "_hot_planes_dev", None),
            )
        return out
