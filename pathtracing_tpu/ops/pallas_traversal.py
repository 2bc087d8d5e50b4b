"""Pallas traversal kernel: block-resident wavefront ray query.

The XLA path (ops/traversal.py) runs one global while_loop over the whole
ray batch, so every step pays the worst lane of the *batch*. This kernel
grids the batch into blocks; each block holds the scene tables in VMEM and
loops only until *its own* rays finish — convergence skew is contained per
block and the node/link row reads come from VMEM instead of HBM.

Scope: scenes whose packed tables fit in VMEM (~16 MB/core) — the golden
test scene (1.6 MB) and mid-size single-model scenes qualify; the full
animated scene (139 MB nl8) stays on the XLA path. The loop body itself is
shared with the XLA path (_run_loop), so semantics are identical by
construction and golden-tested in interpret mode.

Status: interpret-mode verified. Mosaic lowering was probed offline via
AOT TPU lowering (jax.jit(...).trace(...).lower(lowering_platforms=
("tpu",)) against the v5e topology): it FAILS — Mosaic's dynamic_gather
requires operand/indices/output to have identical 2-D shapes (a VREG
permute), so a (N, 8) table row-gather by (R,) lane indices is not
expressible; scalar-prefetch block index_maps don't apply either because
traversal indices are produced inside the loop. Large-table random
gathers are exactly what XLA's native gather HLO provides (measured
~865 GB/s for packed rows on v5e), so the XLA wavefront path in
ops/traversal.py IS the TPU-native fast path, and ray_query_auto's
fallback (below) is the production behavior, not a stopgap.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pathtracing_tpu.ops.traversal import (
    RayHit,
    _finalize_hit,
    _run_loop,
    init_state,
    make_consts,
    ray_query,
)
from pathtracing_tpu.utils.vec import Vec3

Array = Any


class _SceneTabs:
    """Duck-typed view with just the fields _run_loop touches."""

    __slots__ = ("nl8", "tri_pos", "inst_f", "inst_u", "nl5")

    def __init__(self, nl8, tri_pos, inst_f, inst_u):
        self.nl8 = nl8
        self.tri_pos = tri_pos
        self.inst_f = inst_f
        self.inst_u = inst_u
        self.nl5 = None  # bf16 rows are an HBM-bandwidth lever; VMEM kernel reads f32


def _kernel(
    nl8_ref, tri_pos_ref, inst_f_ref, inst_u_ref,
    tlc_ref, tlo_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tmax_ref, act_ref,
    thit_ref, u_ref, v_ref, inst_ref, prim_ref, back_ref, occ_ref,
    *, tmin: float, anyhit: bool, leaf_every: int | None,
):
    tabs = _SceneTabs(
        nl8=nl8_ref[...],
        tri_pos=tri_pos_ref[...],
        inst_f=inst_f_ref[...],
        inst_u=inst_u_ref[...],
    )
    org = Vec3(ox_ref[...], oy_ref[...], oz_ref[...])
    d = Vec3(dx_ref[...], dy_ref[...], dz_ref[...])
    active = act_ref[...] != 0

    consts = make_consts(tlc_ref[...], tlo_ref[...], org, d)
    state = init_state(org.x.shape, active, tmax_ref[...])
    final = _run_loop(
        tabs, state, consts, jnp.float32(tmin), anyhit, None,
        leaf_every=leaf_every,
    )

    hit = _finalize_hit(tabs, consts, final)
    thit_ref[...] = hit.thit
    u_ref[...] = hit.bary_u
    v_ref[...] = hit.bary_v
    inst_ref[...] = hit.inst
    prim_ref[...] = hit.prim
    back_ref[...] = hit.back.astype(jnp.int32)
    occ_ref[...] = final.occluded.astype(jnp.int32)


def ray_query_pallas(
    scene,
    tlas_count: Array,
    tlas_offset: Array,
    org: Vec3,
    d: Vec3,
    tmin: float,
    tmax0,
    active: Array,
    anyhit: bool = False,
    block: int = 2048,
    interpret: bool | None = None,
    leaf_every: int | None = None,
):
    """Pallas-gridded ray query; same contract as traversal.ray_query."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R = org.x.shape[0]
    pad = (-R) % block
    n_blocks = (R + pad) // block

    def pad1(a, fill=0):
        a = jnp.asarray(a)
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    tmax0 = jnp.broadcast_to(jnp.asarray(tmax0, jnp.float32), (R,))

    ray_in = [
        pad1(tlas_count), pad1(tlas_offset),
        pad1(org.x), pad1(org.y), pad1(org.z),
        pad1(d.x), pad1(d.y), pad1(d.z, fill=1),
        pad1(tmax0),
        pad1(active.astype(jnp.int32)),
    ]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape))
    blk = pl.BlockSpec((block,), lambda i: (i,))

    out_shape = [
        jax.ShapeDtypeStruct((R + pad,), jnp.float32),  # thit
        jax.ShapeDtypeStruct((R + pad,), jnp.float32),  # u
        jax.ShapeDtypeStruct((R + pad,), jnp.float32),  # v
        jax.ShapeDtypeStruct((R + pad,), jnp.int32),    # inst
        jax.ShapeDtypeStruct((R + pad,), jnp.int32),    # prim
        jax.ShapeDtypeStruct((R + pad,), jnp.int32),    # back
        jax.ShapeDtypeStruct((R + pad,), jnp.int32),    # occluded
    ]

    outs = pl.pallas_call(
        functools.partial(
            _kernel, tmin=float(tmin), anyhit=anyhit, leaf_every=leaf_every
        ),
        grid=(n_blocks,),
        in_specs=[
            full(scene.nl8), full(scene.tri_pos),
            full(scene.inst_f), full(scene.inst_u),
        ] + [blk] * len(ray_in),
        out_specs=[blk] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(scene.nl8, scene.tri_pos, scene.inst_f, scene.inst_u, *ray_in)

    thit, u, v, inst, prim, back, occ = (o[:R] for o in outs)
    hit = RayHit(
        thit=thit, bary_u=u, bary_v=v, bary_w=1.0 - u - v,
        inst=inst, prim=prim, back=back != 0,
    )
    return hit, occ != 0


def vmem_fits(scene, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Whether the scene's hot tables fit the per-core VMEM budget."""
    total = sum(
        int(np.prod(t.shape)) * 4
        for t in (scene.nl8, scene.tri_pos, scene.inst_f, scene.inst_u)
    )
    return total <= budget_bytes


def ray_query_auto(scene, *args, **kwargs):
    """Pallas kernel when the scene fits VMEM and lowering succeeds,
    XLA wavefront otherwise."""
    if vmem_fits(scene):
        try:
            return ray_query_pallas(scene, *args, **kwargs)
        except Exception:  # Mosaic lowering gaps -> XLA fallback
            pass
    kwargs.pop("block", None)
    kwargs.pop("interpret", None)
    return ray_query(scene, *args, **kwargs)
