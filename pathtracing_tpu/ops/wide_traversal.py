"""Mega-table wide-BVH traversal: one 192 B row gather per step.

The TPU-native fast path (accel/wide.py for the layout and the
bit-exactness argument; BENCH_NOTES.md round-2 cost model for why). Every
step gathers exactly ONE row from the unified (M, 48) table and branches on
the cursor's kind tag:

  WIDE: slab-test 8 bf16-conservative child slots at once (reference
        semantics per slot: ray_query.hh:193-207), descend to the first
        accepted slot at or after the cursor's start slot, else follow the
        row's static exit link (the octant-DFS successor);
  LEAF: run the exact watertight test on 4 inlined triangles (reference:
        math.hh:358-401, confirm rules ray_query.hh:280-290) and fold the
        batch winner into the closest hit / occlusion flag;
  INST: TLAS->BLAS descent (reference: ray_query.hh:153-182): transform the
        ray by the inlined inverse transform, pick the per-octant BLAS
        entry link.

Confirmed-candidate sequence is identical to ops/traversal.py's binary
walk (see accel/wide.py docstring), so results are bit-identical; golden
equivalence is asserted in tests/test_wide.py.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.accel.wide import (
    END_BLAS,
    END_TLAS,
    LAYOUTS_BY_WIDTH,
    RETURN_SENTINEL,
)
from pathtracing_tpu.ops.traversal import (
    RayHit,
    _finalize_hit,
    _partition_not_done,
    _safe_inv,
    _octant,
    _tri_preprocess,
    _tri_intersect,
    make_consts,
)
from pathtracing_tpu.utils.vec import Vec3, where3


def _layout_of(scene):
    """Recover the (static) WideLayout from the mega table's row width."""
    return LAYOUTS_BY_WIDTH[scene.wide_rows.shape[1]]


def root_cursor(scene, tlas_offset, oct_):
    """Per-lane TLAS root cursor: wide_root is indexed by
    tlas_offset - wide_root_base (base 0 for one-shot packs; the frame
    packer ships a tail-only table)."""
    idx = tlas_offset
    base = getattr(scene, "wide_root_base", None)
    if base is not None:
        idx = idx - base
    return jax.lax.bitcast_convert_type(
        scene.wide_root[idx, oct_], jnp.uint32
    )

Array = Any

_U = lambda v: jnp.uint32(v)


class _WideTravState(NamedTuple):
    cursor: Array        # uint32 mega-table cursor
    p_leaf: Array        # uint32 parked LEAF row cursor (two-speed), or END
    inst_resume: Array   # uint32: TLAS continuation while inside a BLAS
    leaf_resume: Array   # uint32: wide continuation while in a leaf chain
    in_blas: Array       # bool
    b_org_x: Array
    b_org_y: Array
    b_org_z: Array
    b_inv_x: Array
    b_inv_y: Array
    b_inv_z: Array
    b_S_x: Array
    b_S_y: Array
    b_S_z: Array
    b_axis: Array
    cand_inst: Array
    done: Array
    tmax: Array
    occluded: Array
    c_inst: Array
    c_prim: Array


def _unpack_bf16_hi(bits):
    return jax.lax.bitcast_convert_type(bits & _U(0xFFFF0000), jnp.float32)


def _unpack_bf16_lo(bits):
    return jax.lax.bitcast_convert_type(bits << 16, jnp.float32)


_EMPTY = np.uint32(0xFFFFFFFF)


def _onehot_row(planes, idx):
    """Bit-exact (R, W) f32 row fetch from int8 byte planes via one MXU
    matmul: planes is (H, 4W) int8 holding the hot rows' u32 words as four
    byte planes biased by -128 (scene/device.py _hot_byte_planes). A dense
    s8 x s8 -> s32 one-hot matmul streams the whole operand through the
    MXU — immune to the gather engine's staging budget AND to
    duplicate-index serialization, the two effects that price per-lane
    hot-row gathers at ~50-80 ns inside the production kernel
    (BENCH_NOTES round 5; standalone cost ~4 ns/lane at H=1024,
    tools/onehot_probe.py). Exactness: products are 0/1 x [-128, 127]
    and each output sums exactly one non-zero term.
    """
    H = planes.shape[0]
    W = planes.shape[1] // 4
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], H), 1)
    oh = (iota == idx[:, None]).astype(jnp.int8)
    prod = jax.lax.dot_general(
        oh, planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    b = [
        (prod[:, i * W:(i + 1) * W] + 128).astype(jnp.uint32)
        for i in range(4)
    ]
    word = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _wide_cheap_step(scene, s: _WideTravState, consts, tmin,
                     hot: bool = False):
    """Two-speed fast gear: gather + S-slot slab + advance + BLAS entry.

    LEAF rows park in the one-deep pending slot and are skipped over using
    their inline next-link (tmax shrinking is deferred = conservative, so
    results stay bit-identical exactly as in the binary two-speed loop,
    ops/traversal.py); a second LEAF while one is parked freezes the lane
    until the next full step. INST rows descend right here (round-3:
    freezing them cost ~K/2 wasted gathers per TLAS->BLAS entry — ~20% of
    traversing lane-steps on the golden scene, tools/mk_stats.py); the
    descent has no confirms, so executing it in the fast gear cannot
    reorder the candidate sequence and results stay bit-identical.

    ``hot=True`` turns the step into a HOT ADVANCE: the row is fetched
    bit-exactly from the int8 byte planes of mega-table rows [0, H) (the
    hottest rows, moved there by accel/hotperm.py) via a one-hot MXU
    matmul, and only lanes whose resolved cursor row is < H advance;
    everyone else freezes (falls out of the kind masks — the two-speed
    conservative-deferral schedule, so hits, occlusion and PER-SAMPLE
    radiance stay bit-identical for every hot schedule;
    tests/test_hotperm.py, re-verified on-chip 2026-08-21).

    STATUS: measured-and-REJECTED on the v5e; default off (BENCH_NOTES
    round 5 "hot-advance campaign"). Standalone the fetch costs 4-11
    ns/lane, but introducing ANY second gathered operand into the
    megakernel's traversal loop (small table, 12 MB padded table, int8
    planes; inline or behind a scalar cond) degrades the loop's PRIMARY
    wide_rows gathers ~4.6x (0.68 -> 3.1 ms/period at frame 900) — a
    program-level XLA effect, not an op cost. A hot advance that fetches
    from wide_rows itself stays fast but then costs a full gather, which
    an ungated extra cheap step dominates. Kept (with tests) for
    re-evaluation on other XLA versions/chips.

    Per-pixel fold-order caveat: hot advances change WHEN lanes die,
    which can reorder the megakernel's per-pixel scatter-add fold across
    samples — per-PIXEL sums at spp > 2 may differ by ~1 ulp between
    hot_k settings (f32 addition is non-associative). Per-sample values
    and the validator PSNR gate are unaffected.
    """
    R = s.cursor.shape
    u32c = lambda v: jnp.full(R, np.uint32(v), jnp.uint32)

    lay = _layout_of(scene)
    S = lay.n_slots
    cur = s.cursor
    done = s.done | (cur == u32c(END_TLAS))
    popped = jnp.logical_not(s.done) & (cur == u32c(END_BLAS))
    cur = jnp.where(popped, s.inst_resume, cur)
    in_blas = s.in_blas & jnp.logical_not(popped)

    kind = cur >> 30
    valid = jnp.logical_not(done)
    row_id = ((cur >> lay.slot_bits) & _U(lay.row_mask)).astype(jnp.int32)
    if hot:
        H = scene.hot_planes.shape[0]
        gate = valid & (row_id < H) & (kind != 3)
        row = _onehot_row(scene.hot_planes, jnp.where(gate, row_id, 0))
    else:
        gate = valid
        row = scene.wide_rows[jnp.where(valid, row_id, 0)]
    rbits = jax.lax.bitcast_convert_type(row, jnp.uint32)

    # In hot mode non-hot lanes freeze by falling out of all three kind
    # masks (their cursor keeps the resolved value, which also commits any
    # pending END_BLAS pop — a legitimate partial transition the next real
    # step continues from). This mask-folding IS the gating: a post-hoc
    # whole-state select (tree_map where) measured 4-5x slower per period
    # on chip because it de-structured the step XLA pattern-matches for
    # the fused gather pipeline (BENCH_NOTES round 5).
    is_wide = gate & (kind == 0)
    is_leaf = gate & (kind == 1)
    is_inst = gate & (kind == 2)

    org = where3(in_blas, Vec3(s.b_org_x, s.b_org_y, s.b_org_z), consts.org)
    inv = where3(in_blas, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z), consts.t_inv)

    start = (cur & _U(S - 1)).astype(jnp.int32)
    c0 = rbits[:, 0 : 3 * S : 3]
    c1 = rbits[:, 1 : 3 * S : 3]
    c2 = rbits[:, 2 : 3 * S : 3]
    ox, oy, oz = org.x[:, None], org.y[:, None], org.z[:, None]
    ix, iy, iz = inv.x[:, None], inv.y[:, None], inv.z[:, None]
    t0x = (_unpack_bf16_hi(c0) - ox) * ix
    t0y = (_unpack_bf16_lo(c0) - oy) * iy
    t0z = (_unpack_bf16_hi(c1) - oz) * iz
    t1x = (_unpack_bf16_lo(c1) - ox) * ix
    t1y = (_unpack_bf16_hi(c2) - oy) * iy
    t1z = (_unpack_bf16_lo(c2) - oz) * iz
    near = jnp.fmax(
        jnp.fmin(t0x, t1x), jnp.fmax(jnp.fmin(t0y, t1y), jnp.fmin(t0z, t1z))
    )
    far = jnp.fmin(
        jnp.fmax(t0x, t1x), jnp.fmin(jnp.fmax(t0y, t1y), jnp.fmax(t0z, t1z))
    )
    tmin_b = tmin if jnp.ndim(tmin) == 0 else tmin[:, None]
    slot_hit = (near <= far) & (far > tmin_b) & (near < s.tmax[:, None])

    links8 = rbits[:, lay.links_col : lay.links_col + S]
    iota8 = jnp.arange(S, dtype=jnp.int32)[None, :]
    slot_ok = slot_hit & (iota8 >= start[:, None]) & (
        links8 != u32c(0xFFFFFFFF)[:, None]
    )
    j = jnp.min(jnp.where(slot_ok, iota8, S), axis=1)
    found = is_wide & (j < S)
    onehot = iota8 == j[:, None]
    target = jnp.max(jnp.where(onehot, links8, 0), axis=1)
    tkind = target >> 30
    exit_link = rbits[:, lay.exit_col]
    resume = jnp.where(
        j < S - 1,
        (cur & ~_U(S - 1)) + (j + 1).astype(jnp.uint32),
        exit_link,
    )
    wide_next = jnp.where(found, target, exit_link)

    # LEAF rows: park + skip via the inline next-link
    can_park = is_leaf & (s.p_leaf == u32c(_EMPTY))
    nxt = rbits[:, lay.next_col]
    leaf_next = jnp.where(nxt == u32c(RETURN_SENTINEL), s.leaf_resume, nxt)

    # INST rows: enter the BLAS (same math as the full step's block).
    # NOT while a leaf row is parked: its deferred flush must run with the
    # b_* ray of ITS OWN BLAS, so a lane with a parked leaf freezes at the
    # INST row until the next full step flushes the park (the full step
    # flushes and descends in the same step, using the pre-update b_*).
    do_inst = is_inst & (s.p_leaf == u32c(_EMPTY))
    fo = row[:, 0:12]
    co, cd = consts.org, consts.d
    bo = Vec3(
        fo[:, 0] * co.x + fo[:, 3] * co.y + fo[:, 6] * co.z + fo[:, 9],
        fo[:, 1] * co.x + fo[:, 4] * co.y + fo[:, 7] * co.z + fo[:, 10],
        fo[:, 2] * co.x + fo[:, 5] * co.y + fo[:, 8] * co.z + fo[:, 11],
    )
    bd = Vec3(
        fo[:, 0] * cd.x + fo[:, 3] * cd.y + fo[:, 6] * cd.z,
        fo[:, 1] * cd.x + fo[:, 4] * cd.y + fo[:, 7] * cd.z,
        fo[:, 2] * cd.x + fo[:, 5] * cd.y + fo[:, 8] * cd.z,
    )
    binv = _safe_inv(bd)
    boct = _octant(bd)
    baxis, bS = _tri_preprocess(bd)
    entry_cols = rbits[:, 12:20]
    oct8 = jnp.arange(8, dtype=jnp.int32)[None, :]
    blas_entry = jnp.max(
        jnp.where(oct8 == boct[:, None], entry_cols, 0), axis=1
    )
    inst_id = jax.lax.bitcast_convert_type(row[:, 20], jnp.int32)

    descend_inst = found & (tkind == 2)
    descend_leaf = found & (tkind == 1)
    cursor = jnp.where(
        is_wide,
        wide_next,
        jnp.where(do_inst, blas_entry, jnp.where(can_park, leaf_next, cur)),
    )
    cursor = jnp.where(done, s.cursor, cursor)

    upd = lambda old, new, m: jnp.where(m, new, old)
    ns = s._replace(
        cursor=cursor,
        p_leaf=jnp.where(can_park, cur, s.p_leaf),
        inst_resume=upd(s.inst_resume, resume, descend_inst),
        leaf_resume=upd(s.leaf_resume, resume, descend_leaf),
        in_blas=in_blas | do_inst,
        b_org_x=upd(s.b_org_x, bo.x, do_inst),
        b_org_y=upd(s.b_org_y, bo.y, do_inst),
        b_org_z=upd(s.b_org_z, bo.z, do_inst),
        b_inv_x=upd(s.b_inv_x, binv.x, do_inst),
        b_inv_y=upd(s.b_inv_y, binv.y, do_inst),
        b_inv_z=upd(s.b_inv_z, binv.z, do_inst),
        b_S_x=upd(s.b_S_x, bS.x, do_inst),
        b_S_y=upd(s.b_S_y, bS.y, do_inst),
        b_S_z=upd(s.b_S_z, bS.z, do_inst),
        b_axis=upd(s.b_axis, baxis, do_inst),
        cand_inst=upd(s.cand_inst, inst_id, do_inst),
        done=done,
    )
    return ns


def _leaf_block(scene, lay, row, s, tmin, mask):
    """The L-triangle exact-test block shared by the full step (current
    LEAF row) and the deferred-flush path (parked row). Reproduces the
    sequential confirm semantics: each passing candidate shrinks tmax
    before the next is judged, winner = min-t with first-index tie-break
    (reference: ray_query.hh:280-290, path_tracer.hh:346-349).

    Stub layouts (LAYOUT_S8) store prim ids only; vertices come from
    scene.tri_pos via the per-instance triangle base (inst_u col 4) —
    the same rows shade_hit gathers, so the exact test is unchanged."""
    R = s.tmax.shape
    prims = jax.lax.bitcast_convert_type(
        row[:, lay.prims_col : lay.prims_col + lay.leaf_tris], jnp.int32
    )
    if lay.stub:
        inst_c = jnp.maximum(s.cand_inst, 0)
        tri_base = scene.inst_u[inst_c, 4]
    b_org = Vec3(s.b_org_x, s.b_org_y, s.b_org_z)
    b_S = Vec3(s.b_S_x, s.b_S_y, s.b_S_z)
    best_t = jnp.full(R, jnp.inf, jnp.float32)
    best_prim = jnp.full(R, 0, jnp.int32)
    any_ok = jnp.zeros(R, bool)
    new_tmax = s.tmax
    for k in range(lay.leaf_tris):
        pk = prims[:, k]
        if lay.stub:
            trow = jnp.where(mask & (pk >= 0), tri_base + pk, 0)
            v = scene.tri_pos[trow]
        else:
            v = row[:, 9 * k : 9 * k + 9]
        ok, _tu, _tv, tt, _tb = _tri_intersect(
            b_org, s.b_axis, b_S,
            Vec3(v[:, 0], v[:, 1], v[:, 2]),
            Vec3(v[:, 3], v[:, 4], v[:, 5]),
            Vec3(v[:, 6], v[:, 7], v[:, 8]),
        )
        ok = ok & (tt < new_tmax) & (tt > tmin) & (pk >= 0) & mask
        take = ok & (tt < best_t)
        best_t = jnp.where(take, tt, best_t)
        best_prim = jnp.where(take, pk, best_prim)
        new_tmax = jnp.where(ok, tt, new_tmax)
        any_ok = any_ok | ok
    return any_ok, best_prim, new_tmax


def _wide_step(scene, s: _WideTravState, consts, tmin, anyhit):
    lay = _layout_of(scene)
    S = lay.n_slots
    R = s.cursor.shape
    u32c = lambda v: jnp.full(R, np.uint32(v), jnp.uint32)

    # ---- sentinel resolution (before the gather) ----
    cur = s.cursor
    done = s.done | (cur == u32c(END_TLAS))
    popped = jnp.logical_not(s.done) & (cur == u32c(END_BLAS))
    cur = jnp.where(popped, s.inst_resume, cur)
    in_blas = s.in_blas & jnp.logical_not(popped)

    kind = cur >> 30
    valid = jnp.logical_not(done)
    row_id = ((cur >> lay.slot_bits) & _U(lay.row_mask)).astype(jnp.int32)
    row = scene.wide_rows[jnp.where(valid, row_id, 0)]      # (R, W) gather
    rbits = jax.lax.bitcast_convert_type(row, jnp.uint32)   # (R, W)

    is_wide = valid & (kind == 0)
    is_leaf = valid & (kind == 1)
    is_inst = valid & (kind == 2)

    org = where3(in_blas, Vec3(s.b_org_x, s.b_org_y, s.b_org_z), consts.org)
    inv = where3(in_blas, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z), consts.t_inv)

    # =============== WIDE: S-slot slab test =========================
    start = (cur & _U(S - 1)).astype(jnp.int32)
    c0 = rbits[:, 0 : 3 * S : 3]   # (R, S): [minx|miny]
    c1 = rbits[:, 1 : 3 * S : 3]   # [minz|maxx]
    c2 = rbits[:, 2 : 3 * S : 3]   # [maxy|maxz]
    nminx = _unpack_bf16_hi(c0)
    nminy = _unpack_bf16_lo(c0)
    nminz = _unpack_bf16_hi(c1)
    nmaxx = _unpack_bf16_lo(c1)
    nmaxy = _unpack_bf16_hi(c2)
    nmaxz = _unpack_bf16_lo(c2)
    ox, oy, oz = org.x[:, None], org.y[:, None], org.z[:, None]
    ix, iy, iz = inv.x[:, None], inv.y[:, None], inv.z[:, None]
    t0x = (nminx - ox) * ix
    t0y = (nminy - oy) * iy
    t0z = (nminz - oz) * iz
    t1x = (nmaxx - ox) * ix
    t1y = (nmaxy - oy) * iy
    t1z = (nmaxz - oz) * iz
    near = jnp.fmax(
        jnp.fmin(t0x, t1x), jnp.fmax(jnp.fmin(t0y, t1y), jnp.fmin(t0z, t1z))
    )
    far = jnp.fmin(
        jnp.fmax(t0x, t1x), jnp.fmin(jnp.fmax(t0y, t1y), jnp.fmax(t0z, t1z))
    )
    tmin_b = tmin if jnp.ndim(tmin) == 0 else tmin[:, None]
    slot_hit = (near <= far) & (far > tmin_b) & (near < s.tmax[:, None])

    links8 = rbits[:, lay.links_col : lay.links_col + S]     # (R, S)
    iota8 = jnp.arange(S, dtype=jnp.int32)[None, :]
    slot_ok = slot_hit & (iota8 >= start[:, None]) & (
        links8 != u32c(0xFFFFFFFF)[:, None]
    )
    j = jnp.min(jnp.where(slot_ok, iota8, S), axis=1)       # (R,)
    found = is_wide & (j < S)
    onehot = (iota8 == j[:, None])
    target = jnp.max(jnp.where(onehot, links8, 0), axis=1)  # links8[j]
    tkind = target >> 30
    exit_link = rbits[:, lay.exit_col]
    # resume cursor for leaf/inst descents: this row at slot j+1, or the
    # row's exit when j was the last slot
    resume = jnp.where(
        j < S - 1,
        (cur & ~_U(S - 1)) + (j + 1).astype(jnp.uint32),
        exit_link,
    )
    wide_next = jnp.where(found, target, exit_link)

    # =============== INST: enter BLAS ================================
    fo = row[:, 0:12]
    co, cd = consts.org, consts.d
    bo = Vec3(
        fo[:, 0] * co.x + fo[:, 3] * co.y + fo[:, 6] * co.z + fo[:, 9],
        fo[:, 1] * co.x + fo[:, 4] * co.y + fo[:, 7] * co.z + fo[:, 10],
        fo[:, 2] * co.x + fo[:, 5] * co.y + fo[:, 8] * co.z + fo[:, 11],
    )
    bd = Vec3(
        fo[:, 0] * cd.x + fo[:, 3] * cd.y + fo[:, 6] * cd.z,
        fo[:, 1] * cd.x + fo[:, 4] * cd.y + fo[:, 7] * cd.z,
        fo[:, 2] * cd.x + fo[:, 5] * cd.y + fo[:, 8] * cd.z,
    )
    binv = _safe_inv(bd)
    boct = _octant(bd)
    baxis, bS = _tri_preprocess(bd)
    entry_cols = rbits[:, 12:20]                      # (R, 8) octant links
    oct8 = jnp.arange(8, dtype=jnp.int32)[None, :]
    oct_onehot = oct8 == boct[:, None]
    blas_entry = jnp.max(jnp.where(oct_onehot, entry_cols, 0), axis=1)
    inst_id = jax.lax.bitcast_convert_type(row[:, 20], jnp.int32)

    # =============== LEAF: 4 exact triangle tests ====================
    # One leaf block serves both the deferred-flush of a parked row (which
    # takes priority — its candidates are older) and the current LEAF row.
    # A lane with both frozen its current row at park time, so "parked and
    # currently at a LEAF row" means the current row waits one more period.
    pend = s.p_leaf != u32c(_EMPTY)
    leaf_cur = is_leaf & jnp.logical_not(pend)
    leaf_mask = pend | leaf_cur
    p_row_id = (
        (s.p_leaf >> lay.slot_bits) & _U(lay.row_mask)
    ).astype(jnp.int32)
    leaf_row_id = jnp.where(
        pend, p_row_id, jnp.where(leaf_cur, row_id, 0)
    )
    leaf_row = scene.wide_rows[jnp.where(leaf_mask, leaf_row_id, 0)]
    any_ok, best_prim, new_tmax_leaf = _leaf_block(
        scene, lay, leaf_row, s, tmin, leaf_mask
    )
    nxt = rbits[:, lay.next_col]
    leaf_next = jnp.where(nxt == u32c(RETURN_SENTINEL), s.leaf_resume, nxt)

    # =============== merge ===========================================
    if anyhit is True:
        ah = jnp.ones(R, bool)
    elif anyhit is False:
        ah = jnp.zeros(R, bool)
    else:
        ah = anyhit
    cfm_any = any_ok & ah
    cfm_cl = any_ok & jnp.logical_not(ah)

    cursor = jnp.where(
        is_wide,
        wide_next,
        jnp.where(is_inst, blas_entry, jnp.where(leaf_cur, leaf_next, cur)),
    )
    descend_leaf = found & (tkind == 1)
    descend_inst = found & (tkind == 2)
    cursor = jnp.where(found, target, cursor)
    # done lanes keep their cursor frozen
    cursor = jnp.where(done | cfm_any, s.cursor, cursor)

    upd = lambda old, new, m: jnp.where(m, new, old)
    return _WideTravState(
        cursor=cursor,
        p_leaf=jnp.where(pend, u32c(_EMPTY), s.p_leaf),
        inst_resume=upd(s.inst_resume, resume, descend_inst),
        leaf_resume=upd(s.leaf_resume, resume, descend_leaf),
        in_blas=(in_blas | is_inst) & jnp.logical_not(cfm_any),
        b_org_x=upd(s.b_org_x, bo.x, is_inst),
        b_org_y=upd(s.b_org_y, bo.y, is_inst),
        b_org_z=upd(s.b_org_z, bo.z, is_inst),
        b_inv_x=upd(s.b_inv_x, binv.x, is_inst),
        b_inv_y=upd(s.b_inv_y, binv.y, is_inst),
        b_inv_z=upd(s.b_inv_z, binv.z, is_inst),
        b_S_x=upd(s.b_S_x, bS.x, is_inst),
        b_S_y=upd(s.b_S_y, bS.y, is_inst),
        b_S_z=upd(s.b_S_z, bS.z, is_inst),
        b_axis=upd(s.b_axis, baxis, is_inst),
        cand_inst=upd(s.cand_inst, inst_id, is_inst),
        done=done | cfm_any,
        tmax=jnp.where(cfm_cl, new_tmax_leaf, s.tmax),
        occluded=s.occluded | cfm_any,
        c_inst=upd(s.c_inst, s.cand_inst, cfm_cl),
        c_prim=upd(s.c_prim, best_prim, cfm_cl),
    )


def _wide_init(R, active, tmax0, root_cursor) -> _WideTravState:
    i32 = lambda v: jnp.full(R, v, jnp.int32)
    f32 = lambda v: jnp.full(R, v, jnp.float32)
    return _WideTravState(
        cursor=jnp.where(
            active, root_cursor, jnp.full(R, np.uint32(END_TLAS), jnp.uint32)
        ),
        p_leaf=jnp.full(R, _EMPTY, jnp.uint32),
        inst_resume=jnp.full(R, np.uint32(END_TLAS), jnp.uint32),
        leaf_resume=jnp.full(R, np.uint32(END_TLAS), jnp.uint32),
        in_blas=jnp.zeros(R, bool),
        b_org_x=f32(0), b_org_y=f32(0), b_org_z=f32(0),
        b_inv_x=f32(0), b_inv_y=f32(0), b_inv_z=f32(0),
        b_S_x=f32(0), b_S_y=f32(0), b_S_z=f32(0),
        b_axis=i32(2),
        cand_inst=i32(-1),
        done=jnp.logical_not(active),
        tmax=tmax0,
        occluded=jnp.zeros(R, bool),
        c_inst=i32(-1),
        c_prim=i32(0),
    )


def _wide_drain(scene, state, consts, tmin, anyhit, max_steps=None,
                leaf_every: int | None = -1):
    """Drain with the two-speed period statically unrolled: ``leaf_every-1``
    cheap steps then flush+full per while iteration (the full step is
    VPU-bound at ~5x the cheap step's cost — BENCH_NOTES round 2).
    ``leaf_every=None`` runs full steps only. Results are bit-identical for
    every K (tests/test_wide.py): the schedule only defers confirms
    conservatively."""
    if leaf_every == -1:
        leaf_every = DEFAULT_WIDE_LEAF_EVERY

    def cond(carry):
        s, step = carry
        alive = jnp.logical_or(
            jnp.any(jnp.logical_not(s.done)),
            jnp.any(s.p_leaf != np.uint32(_EMPTY)),
        )
        if max_steps is None:
            return alive
        return jnp.logical_and(alive, step < max_steps)

    def body(carry):
        s, step = carry
        if leaf_every is not None:
            for _ in range(leaf_every - 1):
                s = _wide_cheap_step(scene, s, consts, tmin)
        s = _wide_step(scene, s, consts, tmin, anyhit)
        return s, step + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return final


def _as_i32_bits(a):
    # INT32, not f32: XLA:TPU's big-buffer copy ops (concatenate, and
    # potentially stack/relayout) flush f32 SUBNORMALS to zero, and uint32
    # cursor/link bit patterns with small row ids are exactly subnormal
    # patterns (measured on v5e, BENCH_NOTES round 3). Integer buffers are
    # never flushed.
    if a.dtype == jnp.int32:
        return a
    if a.dtype == jnp.bool_:
        return a.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _from_i32_bits(col, like):
    if like.dtype == jnp.int32:
        return col
    if like.dtype == jnp.bool_:
        return col != 0
    return jax.lax.bitcast_convert_type(col, like.dtype)


def _pack_lanes(tree):
    """Stack a pytree of (R,) arrays into one (R, C) int32 bit matrix, so a
    compaction permute costs ONE row gather instead of C one-column gathers
    (each of which pays the full ~10 ns/row fixed price — BENCH_NOTES)."""
    leaves = jax.tree.leaves(tree)
    mat = jnp.stack([_as_i32_bits(a) for a in leaves], axis=1)
    return mat, leaves


def _unpack_lanes(mat, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out = [
        _from_i32_bits(mat[:, i], like) for i, like in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, out)


def _wide_compacted(scene, state, consts, tmin, anyhit, schedule,
                    leaf_every=-1):
    R_ = state.done.shape[0]
    if not schedule or R_ // schedule[0][1] < 1024:
        return _wide_drain(scene, state, consts, tmin, anyhit, None,
                           leaf_every=leaf_every)
    (after, div), rest = schedule[0], schedule[1:]
    state = _wide_drain(scene, state, consts, tmin, anyhit, after,
                        leaf_every=leaf_every)
    take = _partition_not_done(state.done)[: R_ // div]
    # permute state+consts as ONE packed matrix: a single row gather per
    # stage instead of ~30 one-column gathers (each ~10 ns/row fixed cost)
    carry = (state, consts) if isinstance(anyhit, bool) else (
        state, consts, anyhit
    )
    if not (isinstance(tmin, float) or tmin.ndim == 0):
        carry = carry + (tmin,)
    mat, _ = _pack_lanes(carry)
    sub_mat = mat[take]
    sub_carry = _unpack_lanes(sub_mat, carry)
    sub, consts_s = sub_carry[0], sub_carry[1]
    k = 2
    anyhit_s = anyhit
    if not isinstance(anyhit, bool):
        anyhit_s = sub_carry[k]
        k += 1
    tmin_s = tmin
    if not (isinstance(tmin, float) or tmin.ndim == 0):
        tmin_s = sub_carry[k]
    sub = _wide_compacted(scene, sub, consts_s, tmin_s, anyhit_s, rest,
                          leaf_every=leaf_every)
    state_mat, _ = _pack_lanes(sub)
    full_mat, _ = _pack_lanes(state)
    state = _unpack_lanes(full_mat.at[take].set(state_mat), state)
    return _wide_drain(scene, state, consts, tmin, anyhit, None,
                       leaf_every=leaf_every)


# (after, div) compaction stages, in PERIODS of the two-speed loop (one
# period = leaf_every steps). Compact only once the alive fraction fits the
# 1/div prefix: compacting too early (e.g. after 2 periods when ~55% of
# golden-scene lanes are still alive) spills the overflow into a full-width
# mop-up and costs 4x (measured on v5e, 2026-08-19). K=4 + ((3,4),(6,4))
# measured 4.0 Mrays/s @262k / 3.1 @1M on the golden scene vs 1.8/1.9 for
# the binary walk.
DEFAULT_WIDE_COMPACT: tuple = ((3, 4), (6, 4))

# Two-speed period: K-1 cheap (gather+slab only) steps per full step.
DEFAULT_WIDE_LEAF_EVERY: int | None = 4


def wide_ray_query(
    scene,
    tlas_count,
    tlas_offset,
    org: Vec3,
    d: Vec3,
    tmin,
    tmax0,
    active,
    anyhit=False,
    compact_schedule: tuple | None = None,
    leaf_every: int | None = -1,
):
    """Drop-in for ops/traversal.ray_query on scenes with wide tables.

    Per-lane TLAS roots come from scene.wide_root[tlas_offset, octant];
    tlas_count is accepted for signature parity but unused (the mega table
    encodes tree extents in its links). compact_schedule stages are in
    two-speed periods; leaf_every=-1 uses DEFAULT_WIDE_LEAF_EVERY, None
    disables the two-speed split. Results are bit-identical for every
    setting of both knobs.
    """
    scene = jax.tree.map(jax.lax.stop_gradient, scene)
    org = jax.tree.map(jax.lax.stop_gradient, org)
    d = jax.tree.map(jax.lax.stop_gradient, d)

    R = org.x.shape
    tmin = jnp.asarray(tmin, jnp.float32)
    tmax0 = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(tmax0, jnp.float32), R)
    )
    oct_ = _octant(d)
    root = root_cursor(scene, tlas_offset, oct_)
    consts = make_consts(tlas_count, tlas_offset, org, d)
    state = _wide_init(R, active, tmax0, root)
    if compact_schedule is None:
        compact_schedule = DEFAULT_WIDE_COMPACT
    final = _wide_compacted(
        scene, state, consts, tmin, anyhit, tuple(compact_schedule),
        leaf_every=leaf_every,
    )

    if anyhit is True:
        zero = jnp.zeros_like(final.tmax)
        hit = RayHit(
            thit=zero - 1.0, bary_u=zero, bary_v=zero,
            bary_w=1.0 - zero, inst=final.c_inst, prim=final.c_prim,
            back=jnp.zeros_like(final.done),
        )
        return hit, final.occluded
    return _finalize_hit(scene, consts, final), final.occluded
