"""Wavefront two-level BVH traversal (device).

Re-expresses the reference's incremental ray-query state machine
(reference: ray_query.hh:111-290) as a batched ``lax.while_loop``: every VPU
lane carries one ray's traversal state (current node, BLAS context, shrinking
tmax, closest hit) and each iteration performs one node visit per lane —
slab test, stackless link follow, TLAS→BLAS descent, or watertight triangle
test. Rays that finish are masked out until the whole wave drains.

Differences from the reference are layout-only: nodes/links/vertices live in
flat SoA tables gathered per lane; semantics (confirm-all closest-hit,
first-candidate any-hit, octant link selection, tmax shrinking) are
bit-faithful and golden-tested against the oracle in tests/test_traversal.py.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.tuning import get_tuning as _get_tuning
from pathtracing_tpu.utils.vec import Vec3, cross, dot3, fabs3, where3

Array = Any

_LEAF_MASK = np.int32(0x7FFFFFFF)
_BIG = np.float32(np.inf)  # C writes 1e40 into a float => +inf


class RayHit(NamedTuple):
    """Closest-hit record (reference: ray_query.hh:24-35)."""

    thit: Array       # < 0 => miss
    bary_u: Array
    bary_v: Array
    bary_w: Array
    inst: Array       # int32; -1 (0xFFFFFFFF) => none
    prim: Array
    back: Array       # bool


def _safe_inv(d: Vec3) -> Vec3:
    """1/dir with zero components replaced (reference: ray_query.hh:130-133)."""
    return Vec3(
        jnp.where(d.x == 0, _BIG, 1.0 / d.x),
        jnp.where(d.y == 0, _BIG, 1.0 / d.y),
        jnp.where(d.z == 0, _BIG, 1.0 / d.z),
    )


def _octant(d: Vec3) -> Array:
    """Link-table selector from direction signs (reference: ray_query.hh:135-138)."""
    return (
        (d.x > 0).astype(jnp.int32)
        + (d.y > 0).astype(jnp.int32) * 2
        + (d.z > 0).astype(jnp.int32) * 4
    )


def _tri_preprocess(d: Vec3):
    """Woop max-axis permutation + shear constants
    (reference: math.hh:340-356). Returns (axis int32, S Vec3)."""
    a = fabs3(d)
    is0 = jnp.logical_and(a.x > a.y, a.x > a.z)
    is1 = jnp.logical_and(jnp.logical_not(is0), a.y > a.z)
    axis = jnp.where(is0, 0, jnp.where(is1, 1, 2)).astype(jnp.int32)
    rdir = Vec3(
        jnp.where(is0, d.z, d.x),
        jnp.where(is1, d.z, d.y),
        jnp.where(is0, d.x, jnp.where(is1, d.y, d.z)),
    )
    inv_z = 1.0 / rdir.z
    return axis, Vec3(rdir.x * inv_z, rdir.y * inv_z, jnp.ones_like(inv_z) * inv_z)


def _tri_intersect(origin: Vec3, axis, S: Vec3, p0: Vec3, p1: Vec3, p2: Vec3):
    """Watertight ray-triangle test (reference: math.hh:358-401).

    Returns (hit bool, u, v, t, back_face bool).
    """
    A = p0 - origin
    B = p1 - origin
    C = p2 - origin
    x = Vec3(A.x, B.x, C.x)
    y = Vec3(A.y, B.y, C.y)
    z = Vec3(A.z, B.z, C.z)
    is0 = axis == 0
    is1 = axis == 1
    x2 = where3(is0, z, x)
    y2 = where3(is1, z, y)
    z2 = where3(is0, x, where3(is1, y, z))
    x3 = x2 - S.x * z2
    y3 = y2 - S.y * z2
    uvw = cross(y3, x3)
    det = uvw.x + uvw.y + uvw.z
    # guarded reciprocal: det==0 lanes are rejected by `hit` anyway, and an
    # inf here would poison gradients of the where that discards them
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    u = uvw.x * inv_det
    v = uvw.y * inv_det
    t = dot3(uvw, S.z * z2) * inv_det
    back = det < 0
    back = jnp.logical_xor(back, S.z < 0)
    back = jnp.logical_xor(back, axis != 2)
    all_pos = (uvw.x >= 0) & (uvw.y >= 0) & (uvw.z >= 0)
    all_neg = (uvw.x <= 0) & (uvw.y <= 0) & (uvw.z <= 0)
    hit = (det != 0) & (t >= 0) & (all_pos | all_neg)
    return hit, u, v, t, back


class _TravState(NamedTuple):
    # TLAS context (origin/dir/inv are loop-invariant, kept outside)
    t_node: Array
    # deferred triangle test (two-speed loop); -1 = empty slot
    p_prim: Array
    # BLAS context
    in_blas: Array
    b_node: Array
    b_count: Array
    b_link_offset: Array
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
    m_tri_offset: Array
    cand_inst: Array
    # query state
    done: Array
    tmax: Array
    occluded: Array
    # closest hit: ids only. thit needs no slot of its own — every closest
    # confirm writes the same value into tmax (reference:
    # ray_query.hh:289), so final thit == tmax bit-exactly; (u, v, back)
    # are re-derived from the ids by one post-drain triangle test
    # (_finalize_hit) instead of riding the loop carry for every step.
    c_inst: Array
    c_prim: Array


def _slab_hit(nmin: Vec3, nmax: Vec3, org: Vec3, inv: Vec3, tmin, tmax):
    """AABB slab test with C fmin/fmax NaN semantics
    (reference: ray_query.hh:197-207)."""
    t0x = (nmin.x - org.x) * inv.x
    t0y = (nmin.y - org.y) * inv.y
    t0z = (nmin.z - org.z) * inv.z
    t1x = (nmax.x - org.x) * inv.x
    t1y = (nmax.y - org.y) * inv.y
    t1z = (nmax.z - org.z) * inv.z
    near = jnp.fmax(jnp.fmin(t0x, t1x), jnp.fmax(jnp.fmin(t0y, t1y), jnp.fmin(t0z, t1z)))
    far = jnp.fmin(jnp.fmax(t0x, t1x), jnp.fmin(jnp.fmax(t0y, t1y), jnp.fmax(t0z, t1z)))
    return (near <= far) & (far > tmin) & (near < tmax)


def _read_node(scene, lidx):
    """One fused row gather for a node visit: AABB + accept/cancel links.

    Reads the bf16-compressed table (scene.nl5, 20 B rows; see
    scene/device.py pack_nl5) when attached, else the f32 nl8 (32 B rows).
    The bf16 bounds are outward-rounded so the slab-accept set is a superset
    of the exact one; traversal results stay bit-identical because every
    candidate still passes the exact triangle test and strict t bounds.
    """
    if scene.nl5 is not None:
        row = scene.nl5[lidx]  # (R, 5)
        bits = jax.lax.bitcast_convert_type(row[:, 0:3], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            bits & np.uint32(0xFFFF0000), jnp.float32
        )
        lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
        nmin = Vec3(hi[:, 0], lo[:, 0], hi[:, 1])
        nmax = Vec3(lo[:, 1], hi[:, 2], lo[:, 2])
        accept = jax.lax.bitcast_convert_type(row[:, 3], jnp.int32)
        cancel = jax.lax.bitcast_convert_type(row[:, 4], jnp.int32)
    else:
        row = scene.nl8[lidx]  # (R, 8)
        nmin = Vec3(row[:, 0], row[:, 1], row[:, 2])
        nmax = Vec3(row[:, 3], row[:, 4], row[:, 5])
        accept = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        cancel = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
    return nmin, nmax, accept, cancel


class _TravConsts(NamedTuple):
    """Per-ray loop-invariant inputs (permutable for compaction)."""

    tlas_count: Array
    tlas_offset: Array
    t_link_offset: Array
    org: Vec3
    d: Vec3
    t_inv: Vec3


def ray_query(
    scene,
    tlas_count: Array,
    tlas_offset: Array,
    org: Vec3,
    d: Vec3,
    tmin,
    tmax0,
    active: Array,
    anyhit: bool | Array = False,
    max_steps: int | None = None,
    return_state: bool = False,
    compact_after: int | None = 32,
    compact_div: int = -1,
    leaf_every: int | None = -1,
    compact_schedule: tuple | None = None,
    mid_entry: bool | None = None,
    unroll: bool | None = None,
):
    """Trace a batch of rays to completion.

    scene: SceneDevice (scene/device.py). tlas_count/offset: per-ray TLAS
    handles (int32). active: lanes that should trace at all.
    Closest-hit mode confirms every candidate (reference:
    path_tracer.hh:346-349); anyhit stops a lane at its first passing
    candidate (reference: path_tracer.hh:415-427). anyhit may be a per-lane
    bool array (MUST be a python bool when uniform) so one wavefront can mix
    shadow and closest-hit rays.
    Returns (RayHit, occluded).

    Convergence-skew mitigation: after ``compact_after`` full-batch steps,
    unfinished rays are partition-compacted into a 1/compact_div prefix
    (``compact_div=-1`` — the default — picks 4, or 8 for large scenes) and
    finish there at 1/compact_div the per-step cost; a final full-batch
    pass mops up any stragglers that did not fit (usually zero steps).
    ``compact_schedule`` generalizes this to nested stages
    ``((after_1, div_1), (after_2, div_2), ...)`` — each stage runs
    ``after_i`` steps at the current width then compacts by ``div_i``
    (relative to the current width) before the next stage; overrides
    compact_after/compact_div (as does ``DEFAULT_COMPACT_SCHEDULE``).
    Results are bit-identical under any schedule (pure lane permutation).

    Two-speed loop: with ``leaf_every=K``, only every K-th iteration runs the
    expensive leaf work (TLAS->BLAS entry, triangle test); the K-1 cheap
    iterations do just the slab test + link follow (~40% of the ops), parking
    one triangle candidate per lane in a pending slot and freezing lanes that
    reach a second leaf.  Results are bit-identical to the one-speed loop:
    deferral only delays tmax shrinking (conservative culling — extra
    candidates are rejected by the strict ``t < tmax`` confirm), and per-lane
    candidate order is unchanged.  ``leaf_every=-1`` (default) means "use
    ``DEFAULT_LEAF_EVERY``"; ``None``/1 disables.

    ``mid_entry=True`` upgrades the cheap step to a BLAS-entry-capable one
    (_mid_step): TLAS-leaf lanes with an empty pending slot descend into the
    BLAS immediately instead of freezing until the next full step — two
    extra instance-row gathers per step buy back ~K/2 frozen iterations per
    BLAS entry, which dominates on instance-heavy scenes (measured ~10
    entries/ray on the full animated scene).  Bit-identical either way.
    ``None`` (default) = use ``DEFAULT_MID_ENTRY`` ("auto" = large scenes).

    ``unroll=True`` lays the whole K-step two-speed period out statically
    inside one while_loop iteration (K-1 cheap steps, pending flush, full
    step), removing the per-step lax.cond dispatch; bit-identical.
    ``None`` = ``DEFAULT_UNROLL``.
    """
    # Wide mega-table fast path (accel/wide.py + ops/wide_traversal.py):
    # one 192 B row gather per step, bit-identical results. Bounded runs /
    # state returns are knobs of the binary walk only, so those callers
    # (perf tooling, the Pallas kernel body) keep the binary path.
    if (
        getattr(scene, "wide_rows", None) is not None
        and max_steps is None
        and not return_state
    ):
        from pathtracing_tpu.ops.wide_traversal import wide_ray_query

        return wide_ray_query(
            scene, tlas_count, tlas_offset, org, d, tmin, tmax0, active,
            anyhit=anyhit,
        )

    # Scene-scale-adaptive defaults. Node count is static under jit, so this
    # is a trace-time constant. Large scenes (the full animated scene:
    # ~600k nodes, instance-heavy, deep BLAS descents — measured step
    # quantiles p50=128/p100=752 vs the golden scene's p50=16) favor a
    # longer two-speed period and stronger compaction; every choice here is
    # bit-identical (tests/test_traversal_twospeed.py, test_traversal_bf16).
    large_scene = (scene.nl8.shape[0] // 8) > LARGE_SCENE_NODES
    tuned = _get_tuning(
        jax.default_backend(), "large" if large_scene else "small"
    )
    if leaf_every == -1:
        le = DEFAULT_LEAF_EVERY_LARGE if large_scene else DEFAULT_LEAF_EVERY
        leaf_every = tuned["leaf_every"] if le == "auto" else le
    if leaf_every is not None and leaf_every <= 1:
        leaf_every = None
    if compact_div == -1:
        compact_div = tuned["compact_div"]
    if mid_entry is None:
        mid_entry = (
            tuned["mid_entry"]
            if DEFAULT_MID_ENTRY == "auto"
            else bool(DEFAULT_MID_ENTRY)
        )
    mid_entry = mid_entry and leaf_every is not None
    if unroll is None:
        unroll = (
            tuned["unroll"] if DEFAULT_UNROLL == "auto" else bool(DEFAULT_UNROLL)
        )
    # Traversal is discrete: gradients flow through the *recomputed* hit
    # (integrator.trace_ray re-derives u/v/t differentiably from the hit
    # ids), never through the search itself.
    scene = jax.tree.map(jax.lax.stop_gradient, scene)
    org = jax.tree.map(jax.lax.stop_gradient, org)
    d = jax.tree.map(jax.lax.stop_gradient, d)

    R = org.x.shape
    i32 = lambda v: jnp.full(R, v, jnp.int32)
    f32 = lambda v: jnp.full(R, v, jnp.float32)

    t_inv = _safe_inv(d)
    t_link_offset = tlas_offset * 8 + _octant(d) * tlas_count
    # tmin may be per-lane (mixed primary/secondary wavefronts); scalars
    # stay 0-d so the pure-scalar path compiles identically
    tmin = jnp.asarray(tmin, jnp.float32)
    tmax0 = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(tmax0, jnp.float32), R)
    )

    state = init_state(R, active, tmax0)

    consts = _TravConsts(
        tlas_count=tlas_count,
        tlas_offset=tlas_offset,
        t_link_offset=t_link_offset,
        org=org,
        d=d,
        t_inv=t_inv,
    )

    if compact_schedule is None:
        compact_schedule = (
            DEFAULT_COMPACT_SCHEDULE
            if DEFAULT_COMPACT_SCHEDULE is not None
            else ((compact_after, compact_div),)
            if compact_after is not None
            else ()
        )

    if max_steps is None and compact_schedule:
        final = _run_compacted(
            scene, state, consts, tmin, anyhit, leaf_every,
            tuple(compact_schedule), mid_entry=mid_entry, unroll=unroll,
        )
    else:
        final = _run_loop(scene, state, consts, tmin, anyhit, max_steps,
                          leaf_every=leaf_every, mid_entry=mid_entry,
                          unroll=unroll)

    if return_state:
        return final

    if leaf_every is not None and max_steps is not None:
        # bounded run: pending candidates never met an in-loop full step
        final = _flush_pending(scene, final, tmin, anyhit)

    if anyhit is True:
        # pure occlusion drain: no closest hit exists to materialize
        # (reference: path_tracer.hh:415-427 discards the candidate)
        zero = jnp.zeros_like(final.tmax)
        hit = RayHit(
            thit=zero - 1.0, bary_u=zero, bary_v=zero,
            bary_w=1.0 - zero, inst=final.c_inst, prim=final.c_prim,
            back=jnp.zeros_like(final.done),
        )
        return hit, final.occluded
    return _finalize_hit(scene, consts, final), final.occluded


def _finalize_hit(scene, consts, s: "_TravState") -> RayHit:
    """Materialize the RayHit from the slim carry (ids + tmax).

    thit is exactly tmax for hit lanes (every closest confirm wrote the
    same tt into both, reference: ray_query.hh:289). (u, v, back) are
    re-derived by one triangle test from the hit ids — the same
    fixed-topology recomputation the integrator's shade_hit performs
    (identical formulas; only kernel-fusion ulps can differ from the
    in-loop values, which sits inside every consumer's tolerance).
    """
    hitm = s.c_inst >= 0
    iidx = jnp.where(hitm, s.c_inst, 0)
    fi = scene.inst_f[iidx]
    ui = scene.inst_u[iidx]
    org, d = consts.org, consts.d
    bo = Vec3(
        fi[:, 0] * org.x + fi[:, 3] * org.y + fi[:, 6] * org.z + fi[:, 9],
        fi[:, 1] * org.x + fi[:, 4] * org.y + fi[:, 7] * org.z + fi[:, 10],
        fi[:, 2] * org.x + fi[:, 5] * org.y + fi[:, 8] * org.z + fi[:, 11],
    )
    bd = Vec3(
        fi[:, 0] * d.x + fi[:, 3] * d.y + fi[:, 6] * d.z,
        fi[:, 1] * d.x + fi[:, 4] * d.y + fi[:, 7] * d.z,
        fi[:, 2] * d.x + fi[:, 5] * d.y + fi[:, 8] * d.z,
    )
    baxis, bS = _tri_preprocess(bd)
    tri_row = jnp.where(hitm, ui[:, 4] + s.c_prim, 0)
    tp = scene.tri_pos[tri_row]
    _, tu, tv, _, tback = _tri_intersect(
        bo, baxis, bS,
        Vec3(tp[:, 0], tp[:, 1], tp[:, 2]),
        Vec3(tp[:, 3], tp[:, 4], tp[:, 5]),
        Vec3(tp[:, 6], tp[:, 7], tp[:, 8]),
    )
    zero = jnp.zeros_like(s.tmax)
    tu = jnp.where(hitm, tu, zero)
    tv = jnp.where(hitm, tv, zero)
    return RayHit(
        thit=jnp.where(hitm, s.tmax, -1.0),
        bary_u=tu,
        bary_v=tv,
        bary_w=1.0 - tu - tv,
        inst=s.c_inst,
        prim=jnp.where(hitm, s.c_prim, 0),
        back=hitm & tback,
    )




def init_state(R, active, tmax0) -> _TravState:
    """Fresh traversal state (reference: ray_query.hh:121-150)."""
    i32 = lambda v: jnp.full(R, v, jnp.int32)
    f32 = lambda v: jnp.full(R, v, jnp.float32)
    return _TravState(
        t_node=i32(0),
        p_prim=i32(-1),
        in_blas=jnp.zeros(R, bool),
        b_node=i32(0),
        b_count=i32(0),
        b_link_offset=i32(0),
        b_org_x=f32(0), b_org_y=f32(0), b_org_z=f32(0),
        b_inv_x=f32(0), b_inv_y=f32(0), b_inv_z=f32(0),
        b_S_x=f32(0), b_S_y=f32(0), b_S_z=f32(0),
        b_axis=i32(2),
        m_tri_offset=i32(0),
        cand_inst=i32(-1),
        done=jnp.logical_not(active),
        tmax=tmax0,
        occluded=jnp.zeros(R, bool),
        c_inst=i32(-1),
        c_prim=i32(0),
    )


def make_consts(tlas_count, tlas_offset, org, d) -> "_TravConsts":
    t_inv = _safe_inv(d)
    return _TravConsts(
        tlas_count=tlas_count,
        tlas_offset=tlas_offset,
        t_link_offset=tlas_offset * 8 + _octant(d) * tlas_count,
        org=org,
        d=d,
        t_inv=t_inv,
    )

def _partition_not_done(done):
    """Stable partition permutation, not-done lanes first (O(n) cumsum+
    scatter — same order as a stable argsort of the done flags)."""
    R_ = done.shape[0]
    n_live = jnp.cumsum(jnp.logical_not(done).astype(jnp.int32))
    dest = jnp.where(
        done,
        (n_live[-1] - 1) + jnp.cumsum(done.astype(jnp.int32)),
        n_live - 1,
    )
    return jnp.zeros(R_, jnp.int32).at[dest].set(
        jnp.arange(R_, dtype=jnp.int32), unique_indices=True
    )


def _run_compacted(scene, state, consts, tmin, anyhit, leaf_every, schedule,
                   mid_entry=False, unroll=None):
    """Drain with nested prefix compaction (see ray_query docstring)."""
    R_ = state.done.shape[0]
    if not schedule or R_ // schedule[0][1] < 1024:
        return _run_loop(scene, state, consts, tmin, anyhit, None,
                         leaf_every=leaf_every, mid_entry=mid_entry,
                         unroll=unroll)
    (after, div), rest = schedule[0], schedule[1:]
    state = _run_loop(scene, state, consts, tmin, anyhit, after,
                      leaf_every=leaf_every, mid_entry=mid_entry,
                      unroll=unroll)
    take = _partition_not_done(state.done)[: R_ // div]
    sub = jax.tree.map(lambda a: a[take], state)
    consts_s = jax.tree.map(lambda a: a[take], consts)
    anyhit_s = anyhit if isinstance(anyhit, bool) else anyhit[take]
    tmin_s = tmin if tmin.ndim == 0 else tmin[take]
    sub = _run_compacted(
        scene, sub, consts_s, tmin_s, anyhit_s, leaf_every, rest,
        mid_entry=mid_entry, unroll=unroll,
    )
    state = jax.tree.map(lambda full, part: full.at[take].set(part), state, sub)
    # mop-up: zero iterations unless more than R/div lanes were unfinished
    return _run_loop(scene, state, consts, tmin, anyhit, None,
                     leaf_every=leaf_every, mid_entry=mid_entry,
                     unroll=unroll)


# Multi-stage compaction override for ray_query(compact_schedule=None);
# module-level so perf tooling can flip it globally.
DEFAULT_COMPACT_SCHEDULE: tuple | None = None

# Default two-speed period for ray_query(leaf_every=-1); module-level so perf
# tooling can flip it globally (re-jit picks it up).  None = one-speed loop.
# "auto" = consult the per-platform tuning table (pathtracing_tpu/tuning.py;
# CPU rows: K=8 small / K=16 large, measured — K=12 optimal on pure
# traversal batches but 8 wins end-to-end under merged shadow+bounce
# drains; K=16 collapses on small scenes from freeze waste).
DEFAULT_LEAF_EVERY: str | int | None = "auto"

# Large-scene variant (chosen when the packed node table exceeds
# LARGE_SCENE_NODES): deep BLAS descents lower the leaf density, favoring
# a longer cheap-step run (tuning-table CPU row: K=16, compact_div=8,
# tools/stress_probe.py 2026-08-17).
DEFAULT_LEAF_EVERY_LARGE: str | int | None = "auto"
LARGE_SCENE_NODES: int = 100_000

# Default for ray_query(unroll=None): unroll the whole two-speed period
# (K-1 cheap + flush + full) into one while_loop iteration — kills the
# per-step lax.cond dispatch and checks the loop condition once per period.
# Bit-identical. Compile size grows ~Kx in the loop body. "auto" = consult
# the per-platform tuning table (pathtracing_tpu/tuning.py).
DEFAULT_UNROLL: str | bool = "auto"

# Default for ray_query(mid_entry=None): the entry-capable cheap step.
# CPU-measured (full scene, frame 900, 131k lanes): the two extra
# instance-row gathers per step cost ~2x, MORE than the saved TLAS-leaf
# freezes => off in the CPU tuning rows. On TPU row gathers are ~40x
# cheaper relative to compute — re-tune there (tools/tpu_session.py
# sweeps it; PT_MID_ENTRY=1 for bench.py). "auto" = tuning table.
DEFAULT_MID_ENTRY: str | bool = "auto"


def _run_loop(scene, state, consts, tmin, anyhit, max_steps, leaf_every=None,
              mid_entry=False, unroll=None):
    # ray_query resolves "auto"s before calling; a bare None here (direct
    # callers, e.g. the Pallas kernel body) means the per-step loop
    if unroll and leaf_every is not None:
        return _run_loop_unrolled(
            scene, state, consts, tmin, anyhit, max_steps, leaf_every,
            mid_entry,
        )

    def cond(carry):
        s, step = carry
        alive = jnp.any(jnp.logical_not(s.done))
        if leaf_every is not None:
            # keep stepping until the next full step flushes any pending
            # candidate: flushing OUTSIDE the while_loop compiles as a
            # different fused computation that XLA:CPU may round differently
            # (observed 4-ulp thit drift), breaking bit-equality with the
            # one-speed loop — all confirms must run in-loop
            alive = jnp.logical_or(alive, jnp.any(s.p_prim >= 0))
        if max_steps is None:
            return alive
        return jnp.logical_and(alive, step < max_steps)

    def body(carry):
        s, step = carry
        if leaf_every is None:
            s = _full_step(scene, s, consts, tmin, anyhit)
        else:
            is_full = (step % leaf_every) == (leaf_every - 1)
            cheap_fn = _mid_step if mid_entry else _cheap_step
            s = jax.lax.cond(
                is_full,
                lambda st: _full_step(
                    scene, _flush_pending(scene, st, tmin, anyhit),
                    consts, tmin, anyhit,
                ),
                lambda st: cheap_fn(scene, st, consts, tmin),
                s,
            )
        return s, step + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    # NOTE: a bounded run (max_steps) may exit with pending candidates; the
    # caller either continues the loop with this state (compaction) or calls
    # _flush_pending itself (ray_query's max_steps path). Unbounded runs
    # always drain pendings in-loop (see cond).
    return final


def _run_loop_unrolled(scene, state, consts, tmin, anyhit, max_steps,
                       leaf_every, mid_entry):
    """Two-speed loop with the whole K-step period unrolled into one
    while_loop iteration: K-1 cheap steps then flush+full, statically laid
    out. Removes the per-step lax.cond dispatch and evaluates the loop
    condition once per period instead of per step. Results are bit-identical
    to the per-step loop: the step schedule within a period is the same, and
    steps on all-done state are no-ops (at most K-1 wasted no-op steps per
    drain, paid once per batch, not per ray). Each period ends with a full
    step, so no pending candidate survives an iteration — but the ENTRY
    state may carry pendings on done lanes (a lane can exhaust its TLAS with
    a candidate parked, e.g. in a bounded pre-compaction run), so the cond
    keeps the pending term to force at least one flushing period then."""
    cheap_fn = _mid_step if mid_entry else _cheap_step
    # ceil so a bounded run executes at least max_steps steps (schedules are
    # result-invariant; only the period phase matters for perf, not bits)
    max_blocks = None if max_steps is None else -(-max_steps // leaf_every)

    def cond(carry):
        s, blocks = carry
        alive = jnp.logical_or(
            jnp.any(jnp.logical_not(s.done)), jnp.any(s.p_prim >= 0)
        )
        if max_blocks is None:
            return alive
        return jnp.logical_and(alive, blocks < max_blocks)

    def body(carry):
        s, blocks = carry
        for _ in range(leaf_every - 1):
            s = cheap_fn(scene, s, consts, tmin)
        s = _full_step(
            scene, _flush_pending(scene, s, tmin, anyhit), consts, tmin,
            anyhit,
        )
        return s, blocks + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return final


def _cheap_step(scene, s, consts, tmin):
    """Slab test + link follow only (two-speed fast path).

    Leaf work is deferred: a triangle candidate parks in the lane's pending
    slot (advancing past the leaf via the cancel link, exactly the node the
    one-speed loop would continue at); a TLAS leaf — or a second triangle
    candidate while one is pending — freezes the lane at that node until the
    next full step re-tests it.
    """
    tlas_count = consts.tlas_count
    count = jnp.where(s.in_blas, s.b_count, tlas_count)
    node_idx = jnp.where(s.in_blas, s.b_node, s.t_node)
    link_off = jnp.where(s.in_blas, s.b_link_offset, consts.t_link_offset)

    in_range = (node_idx >= 0) & (node_idx < count)
    valid = in_range & jnp.logical_not(s.done)
    exhausted = jnp.logical_not(in_range) & jnp.logical_not(s.done)
    done = s.done | (exhausted & jnp.logical_not(s.in_blas))
    in_blas = s.in_blas & jnp.logical_not(exhausted)
    valid = valid & jnp.logical_not(exhausted)

    lidx = jnp.where(valid, link_off + node_idx, 0)
    nmin, nmax, accept, cancel = _read_node(scene, lidx)

    o = where3(in_blas, Vec3(s.b_org_x, s.b_org_y, s.b_org_z), consts.org)
    inv = where3(in_blas, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z), consts.t_inv)

    hit = _slab_hit(nmin, nmax, o, inv, tmin, s.tmax)
    is_leaf = accept < 0
    payload = accept & _LEAF_MASK

    leaf_hit = valid & hit & is_leaf
    tri_leaf = leaf_hit & in_blas
    can_defer = tri_leaf & (s.p_prim < 0)
    freeze = (leaf_hit & jnp.logical_not(in_blas)) | (tri_leaf & (s.p_prim >= 0))
    advance = valid & jnp.logical_not(freeze)

    next_idx = jnp.where(hit & jnp.logical_not(is_leaf), accept, cancel)
    t_node = jnp.where(advance & jnp.logical_not(in_blas), next_idx, s.t_node)
    b_node = jnp.where(advance & in_blas, next_idx, s.b_node)
    p_prim = jnp.where(can_defer, payload, s.p_prim)

    return s._replace(
        t_node=t_node, b_node=b_node, p_prim=p_prim, done=done, in_blas=in_blas
    )


def _enter_fields(scene, consts, enter, payload):
    """BLAS-entry computation (reference: ray_query.hh:153-182) for the mid
    (entry-capable) step; mirrors _full_step's inline entry block. Returns
    the per-lane values to select into the BLAS context where ``enter``
    holds."""
    org, d = consts.org, consts.d
    iidx = jnp.where(enter, payload, 0)
    fi = scene.inst_f[iidx]  # (R, 21): inv cols (12) + rot (9)
    ui = scene.inst_u[iidx]  # (R, 6)
    bo = Vec3(
        fi[:, 0] * org.x + fi[:, 3] * org.y + fi[:, 6] * org.z + fi[:, 9],
        fi[:, 1] * org.x + fi[:, 4] * org.y + fi[:, 7] * org.z + fi[:, 10],
        fi[:, 2] * org.x + fi[:, 5] * org.y + fi[:, 8] * org.z + fi[:, 11],
    )
    bd = Vec3(
        fi[:, 0] * d.x + fi[:, 3] * d.y + fi[:, 6] * d.z,
        fi[:, 1] * d.x + fi[:, 4] * d.y + fi[:, 7] * d.z,
        fi[:, 2] * d.x + fi[:, 5] * d.y + fi[:, 8] * d.z,
    )
    binv = _safe_inv(bd)
    boct = _octant(bd)
    baxis, bS = _tri_preprocess(bd)
    blink = ui[:, 1] * 8 + boct * ui[:, 0]
    return bo, binv, bS, baxis, blink, ui[:, 0], ui[:, 4]


def _apply_enter(s, enter, payload, bo, binv, bS, baxis, blink, bcount, mtri):
    """Select the entry values into the state for ``enter`` lanes."""
    def upd(old, new):
        return jnp.where(enter, new, old)

    return s._replace(
        in_blas=s.in_blas | enter,
        b_node=jnp.where(enter, 0, s.b_node),
        b_count=upd(s.b_count, bcount),
        b_link_offset=upd(s.b_link_offset, blink),
        b_org_x=upd(s.b_org_x, bo.x), b_org_y=upd(s.b_org_y, bo.y),
        b_org_z=upd(s.b_org_z, bo.z),
        b_inv_x=upd(s.b_inv_x, binv.x), b_inv_y=upd(s.b_inv_y, binv.y),
        b_inv_z=upd(s.b_inv_z, binv.z),
        b_S_x=upd(s.b_S_x, bS.x), b_S_y=upd(s.b_S_y, bS.y),
        b_S_z=upd(s.b_S_z, bS.z),
        b_axis=upd(s.b_axis, baxis),
        m_tri_offset=upd(s.m_tri_offset, mtri),
        cand_inst=upd(s.cand_inst, payload),
    )


def _mid_step(scene, s, consts, tmin):
    """Cheap step that can also ENTER a BLAS (three-speed middle gear).

    Identical to _cheap_step except TLAS-leaf lanes with an empty pending
    slot descend into the BLAS immediately (exactly what the one-speed loop
    does) instead of freezing until the next full step. Lanes with a parked
    triangle candidate still freeze — the pending flush needs the lane's
    current BLAS context. Triangle tests stay deferred, so per-lane
    candidate order is unchanged and results remain bit-identical.
    """
    tlas_count = consts.tlas_count
    count = jnp.where(s.in_blas, s.b_count, tlas_count)
    node_idx = jnp.where(s.in_blas, s.b_node, s.t_node)
    link_off = jnp.where(s.in_blas, s.b_link_offset, consts.t_link_offset)

    in_range = (node_idx >= 0) & (node_idx < count)
    valid = in_range & jnp.logical_not(s.done)
    exhausted = jnp.logical_not(in_range) & jnp.logical_not(s.done)
    done = s.done | (exhausted & jnp.logical_not(s.in_blas))
    in_blas = s.in_blas & jnp.logical_not(exhausted)
    valid = valid & jnp.logical_not(exhausted)

    lidx = jnp.where(valid, link_off + node_idx, 0)
    nmin, nmax, accept, cancel = _read_node(scene, lidx)

    o = where3(in_blas, Vec3(s.b_org_x, s.b_org_y, s.b_org_z), consts.org)
    inv = where3(in_blas, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z), consts.t_inv)

    hit = _slab_hit(nmin, nmax, o, inv, tmin, s.tmax)
    is_leaf = accept < 0
    payload = accept & _LEAF_MASK

    leaf_hit = valid & hit & is_leaf
    tri_leaf = leaf_hit & in_blas
    tlas_leaf = leaf_hit & jnp.logical_not(in_blas)
    can_defer = tri_leaf & (s.p_prim < 0)
    enter = tlas_leaf & (s.p_prim < 0)
    # any leaf while a candidate is parked freezes: the pending flush
    # needs the lane's current BLAS context intact
    freeze = leaf_hit & jnp.logical_not(can_defer | enter)
    advance = valid & jnp.logical_not(freeze)

    next_idx = jnp.where(hit & jnp.logical_not(is_leaf), accept, cancel)
    # entering lanes resume the TLAS past the leaf via its cancel link
    # when the BLAS pops (reference: ray_query.hh:262-268 continuation)
    t_node = jnp.where(
        advance & jnp.logical_not(in_blas), next_idx, s.t_node
    )
    b_node = jnp.where(advance & in_blas & jnp.logical_not(enter), next_idx, s.b_node)
    p_prim = jnp.where(can_defer, payload, s.p_prim)

    s = s._replace(
        t_node=t_node, b_node=b_node, p_prim=p_prim, done=done,
        in_blas=in_blas,
    )
    fields = _enter_fields(scene, consts, enter, payload)
    return _apply_enter(s, enter, payload, *fields)


def _flush_pending(scene, s, tmin, anyhit):
    """Run the deferred triangle test of each lane's pending slot.

    By construction the lane's BLAS context (b_org/b_S/b_axis, cand_inst,
    m_tri_offset) is still the one the candidate was found under — entering a
    new BLAS freezes until a full step, and full steps flush first.  tmax here
    already reflects every earlier confirm, so the strict ``t < tmax`` test
    sees exactly the value the one-speed loop would have used.
    """
    pend = s.p_prim >= 0
    tri_row = jnp.where(pend, s.m_tri_offset + s.p_prim, 0)
    tp = scene.tri_pos[tri_row]  # (R, 12)
    p0 = Vec3(tp[:, 0], tp[:, 1], tp[:, 2])
    p1 = Vec3(tp[:, 3], tp[:, 4], tp[:, 5])
    p2 = Vec3(tp[:, 6], tp[:, 7], tp[:, 8])
    b_org = Vec3(s.b_org_x, s.b_org_y, s.b_org_z)
    b_S = Vec3(s.b_S_x, s.b_S_y, s.b_S_z)
    ok, tu, tv, tt, tback = _tri_intersect(b_org, s.b_axis, b_S, p0, p1, p2)
    confirmed = pend & ok & (tt < s.tmax) & (tt > tmin)

    if anyhit is True:
        return s._replace(
            occluded=s.occluded | confirmed,
            done=s.done | confirmed,
            p_prim=jnp.where(pend, -1, s.p_prim),
        )
    if anyhit is False:
        cfm_any = jnp.zeros_like(confirmed)
        cfm_cl = confirmed
    else:
        cfm_any = confirmed & anyhit
        cfm_cl = confirmed & jnp.logical_not(anyhit)
    return s._replace(
        occluded=s.occluded | cfm_any,
        done=s.done | cfm_any,
        c_inst=jnp.where(cfm_cl, s.cand_inst, s.c_inst),
        c_prim=jnp.where(cfm_cl, s.p_prim, s.c_prim),
        tmax=jnp.where(cfm_cl, tt, s.tmax),
        p_prim=jnp.where(pend, -1, s.p_prim),
    )


def _full_step(scene, s, consts, tmin, anyhit):
    tlas_count = consts.tlas_count
    t_link_offset = consts.t_link_offset
    org = consts.org
    d = consts.d
    t_inv = consts.t_inv

    count = jnp.where(s.in_blas, s.b_count, tlas_count)
    node_idx = jnp.where(s.in_blas, s.b_node, s.t_node)
    link_off = jnp.where(s.in_blas, s.b_link_offset, t_link_offset)

    in_range = (node_idx >= 0) & (node_idx < count)
    valid = in_range & jnp.logical_not(s.done)
    exhausted = jnp.logical_not(in_range) & jnp.logical_not(s.done)
    # TLAS exhausted => done; BLAS exhausted => pop to TLAS
    # (reference: ray_query.hh:271-275).
    done = s.done | (exhausted & jnp.logical_not(s.in_blas))
    in_blas = s.in_blas & jnp.logical_not(exhausted)
    valid = valid & jnp.logical_not(exhausted)

    lidx = jnp.where(valid, link_off + node_idx, 0)
    nmin, nmax, accept, cancel = _read_node(scene, lidx)

    o = where3(in_blas, Vec3(s.b_org_x, s.b_org_y, s.b_org_z), org)
    inv = where3(in_blas, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z), t_inv)

    hit = _slab_hit(nmin, nmax, o, inv, tmin, s.tmax)
    is_leaf = accept < 0  # top bit set (reference: bvh.hh:57-63)
    payload = accept & _LEAF_MASK
    next_idx = jnp.where(hit & jnp.logical_not(is_leaf), accept, cancel)

    t_node = jnp.where(valid & jnp.logical_not(in_blas), next_idx, s.t_node)
    b_node = jnp.where(valid & in_blas, next_idx, s.b_node)

    leaf_hit = valid & hit & is_leaf
    enter = leaf_hit & jnp.logical_not(in_blas)
    test = leaf_hit & in_blas

    # ---- enter BLAS (reference: ray_query.hh:153-182) ----
    iidx = jnp.where(enter, payload, 0)
    fi = scene.inst_f[iidx]  # (R, 21): inv cols (12) + rot (9)
    ui = scene.inst_u[iidx]  # (R, 6)
    bo = Vec3(
        fi[:, 0] * org.x + fi[:, 3] * org.y + fi[:, 6] * org.z + fi[:, 9],
        fi[:, 1] * org.x + fi[:, 4] * org.y + fi[:, 7] * org.z + fi[:, 10],
        fi[:, 2] * org.x + fi[:, 5] * org.y + fi[:, 8] * org.z + fi[:, 11],
    )
    bd = Vec3(
        fi[:, 0] * d.x + fi[:, 3] * d.y + fi[:, 6] * d.z,
        fi[:, 1] * d.x + fi[:, 4] * d.y + fi[:, 7] * d.z,
        fi[:, 2] * d.x + fi[:, 5] * d.y + fi[:, 8] * d.z,
    )
    binv = _safe_inv(bd)
    boct = _octant(bd)
    baxis, bS = _tri_preprocess(bd)
    blink = ui[:, 1] * 8 + boct * ui[:, 0]

    def upd(old, new, mask=enter):
        return jnp.where(mask, new, old)

    b_count = upd(s.b_count, ui[:, 0])
    m_tri_offset = upd(s.m_tri_offset, ui[:, 4])
    b_link_offset = upd(s.b_link_offset, blink)
    b_org = where3(enter, bo, Vec3(s.b_org_x, s.b_org_y, s.b_org_z))
    b_inv = where3(enter, binv, Vec3(s.b_inv_x, s.b_inv_y, s.b_inv_z))
    b_S = where3(enter, bS, Vec3(s.b_S_x, s.b_S_y, s.b_S_z))
    b_axis = upd(s.b_axis, baxis)
    b_node = jnp.where(enter, 0, b_node)
    cand_inst = upd(s.cand_inst, payload)
    in_blas = in_blas | enter

    # ---- triangle test (reference: ray_query.hh:225-246) ----
    tri_row = jnp.where(test, m_tri_offset + payload, 0)
    tp = scene.tri_pos[tri_row]  # (R, 12)
    p0 = Vec3(tp[:, 0], tp[:, 1], tp[:, 2])
    p1 = Vec3(tp[:, 3], tp[:, 4], tp[:, 5])
    p2 = Vec3(tp[:, 6], tp[:, 7], tp[:, 8])
    thit_ok, tu, tv, tt, tback = _tri_intersect(
        b_org, b_axis, b_S, p0, p1, p2
    )
    confirmed = test & thit_ok & (tt < s.tmax) & (tt > tmin)

    if anyhit is True:
        occluded = s.occluded | confirmed
        done = done | confirmed
        c_inst, c_prim = s.c_inst, s.c_prim
        tmax = s.tmax
    else:
        # confirm every candidate (reference: path_tracer.hh:346-349,
        # ray_query.hh:280-290); a per-lane anyhit mask splits the confirm
        # set into occlusion lanes and closest-hit lanes
        if anyhit is False:
            cfm_any = jnp.zeros_like(confirmed)
            cfm_cl = confirmed
        else:
            cfm_any = confirmed & anyhit
            cfm_cl = confirmed & jnp.logical_not(anyhit)
        occluded = s.occluded | cfm_any
        done = done | cfm_any
        c_inst = jnp.where(cfm_cl, cand_inst, s.c_inst)
        c_prim = jnp.where(cfm_cl, payload, s.c_prim)
        tmax = jnp.where(cfm_cl, tt, s.tmax)

    new_state = _TravState(
        t_node=t_node,
        p_prim=s.p_prim,
        in_blas=in_blas,
        b_node=b_node,
        b_count=b_count,
        b_link_offset=b_link_offset,
        b_org_x=b_org.x, b_org_y=b_org.y, b_org_z=b_org.z,
        b_inv_x=b_inv.x, b_inv_y=b_inv.y, b_inv_z=b_inv.z,
        b_S_x=b_S.x, b_S_y=b_S.y, b_S_z=b_S.z,
        b_axis=b_axis,
        m_tri_offset=m_tri_offset,
        cand_inst=cand_inst,
        done=done,
        tmax=tmax,
        occluded=occluded,
        c_inst=c_inst,
        c_prim=c_prim,
    )
    return new_state
