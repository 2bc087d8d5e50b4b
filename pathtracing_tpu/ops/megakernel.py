"""Persistent-lane megakernel renderer: traversal + shading in ONE loop.

The drain-based wavefront (ops/wavefront.py) pays worst-lane for every
bounce's ray_query drain: a lane whose rays finish in 8 steps idles while
p100 lanes walk 40, and compaction between drain stages costs ~10 ns/lane
per stage. Here there are NO drains: every lane owns one path and the wide
traversal loop (ops/wide_traversal.py) IS the render loop — when a lane's
current ray completes, the next service step shades it and immediately
launches its next ray (shadow -> bounce -> next bounce -> next sample), so
occupancy never depends on other lanes' ray lengths.

Loop structure per while-iteration ("period"): K-1 cheap traversal steps
(one 192 B row gather + 8-slot slab test; parked-leaf deferral as in the
two-speed drain) then one service step = full traversal step + shade/
respawn for lanes whose ray just finished.

Per-lane semantics are the reference's exactly (reference:
path_tracer.hh:637-741), with the same per-lane draw order as the
wavefront renderer: film; [primary]; cond-atmo; then per bounce nee, bsdf,
cond-atmo — each lane's seed advances only on its own masked draws, so
per-sample radiance matches the scan/wavefront renderers to
kernel-fusion ulps (tests/test_megakernel.py).

Area-light NEE scenes (scene.lt_tris, ops/arealights.py) add one more
phase to the lane's ray chain: shade -> sun shadow -> area shadow ->
bounce, with the same extra rand4 draw and the same one-sample-MIS
weights as the wavefront/scan integrators (tests/test_arealights.py
covers megakernel == scan on the cornell scene).
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops import rng
from pathtracing_tpu.ops.bsdf import sample_bsdf
from pathtracing_tpu.ops.camera import camera_from_table, get_camera_ray
from pathtracing_tpu.ops.integrator import (
    HitInfo,
    LightParams,
    NeeState,
    light_from_table,
    nee_finish,
    nee_prepare,
    shade_hit,
)
from pathtracing_tpu.ops.samplers import sample_gaussian_weighted_disk
from pathtracing_tpu.ops.sky import atmosphere_scattering
from pathtracing_tpu.ops.traversal import (
    _TravConsts,
    _finalize_hit,
    _octant,
    _safe_inv,
)
from pathtracing_tpu.ops.wide_traversal import (
    _EMPTY,
    _WideTravState,
    _wide_cheap_step,
    _wide_init,
    _wide_step,
    root_cursor,
)
from pathtracing_tpu.accel.wide import END_TLAS
from pathtracing_tpu.utils.vec import (
    Mat3,
    Vec2,
    Vec3,
    Vec4,
    normalize3,
    where3,
)

Array = Any
f32 = np.float32

# phases of a lane's current traversal
_PH_PRIMARY = 0
_PH_SHADOW = 1
_PH_BOUNCE = 2
_PH_SHADOW2 = 3   # area-light shadow ray (only when scene.lt_tris exist)

DEFAULT_MK_LEAF_EVERY = 4
# Hot advances per step when the scene ships a hot table. 0 = off, the
# measured optimum: ANY second gathered operand in the traversal loop
# degrades the primary wide_rows gathers ~4.6x on the v5e (BENCH_NOTES
# round-5 hot-advance campaign; ops/wide_traversal._wide_cheap_step).
DEFAULT_MK_HOT_K = 0


def _sel(mask, new, old):
    return jax.tree.map(lambda a, b: jnp.where(mask, a, b), new, old)


class _MkState(NamedTuple):
    # DYNAMIC work queue: one item = one (pixel, sample) pair, sample-major
    # (item = sample*n_pixels + pixel). Lane L boots on item L; when an
    # item dies, the lane takes the next unassigned item off a shared
    # counter — its grant rank is a cumsum over this service's deaths, so
    # the queue needs no atomics and stays deterministic. This removes the
    # ramp-down tail the static interleave left (24% of lane-steps idle in
    # lane_done at 8192 lanes / spp 8 — tools/mk_stats.py): with a queue
    # the tail is bounded by the single longest item. Completed item sums
    # scatter-add into per-PIXEL planes (mode=drop), so accumulator memory
    # is O(n_pixels) — the production config (1920x1080 @ 1024 spp) carries
    # 25 MB instead of the 25 GB the per-item planes needed.
    item: Array            # (R,) int32: the lane's live work item
    next_item: Array       # () int32: first unassigned item (shared queue)
    acc_r: Array           # (n_pixels,) f32 per-pixel radiance sums
    acc_g: Array
    acc_b: Array
    acc_l2: Array          # (n_pixels,) luminance^2 sums when with_stats
    #                        (adaptive sampling's variance pass), else (0,)
    # path state (mirrors ops/wavefront._WfState)
    seed: Any              # rng.Seed
    bounce_i: Array
    info: Any              # HitInfo of the PREVIOUS closest hit
    roughness: Array
    attenuation: Vec3
    regularization: Array
    cur: Vec3
    tlas_count: Array
    tlas_offset: Array
    light: Any             # LightParams
    lane_done: Array       # all samples complete
    # current ray
    phase: Array           # _PH_*
    ray_o: Vec3
    ray_d: Vec3
    t_inv: Vec3
    tmin: Array
    # pending NEE context (prep -> shadow result -> finish)
    nee: Any               # NeeState
    occ_nee: Array
    # pending area-light NEE context (None-like zeros when no lt tables)
    area: Any              # arealights.AreaSample
    occ_area: Array
    # queued bounce ray direction + bsdf sample record
    b_dir: Vec3
    b_atten: Vec3
    b_pdf: Array
    # record-mode hit-topology planes (diff/render fast gradients):
    # primary (n_items,) + per-bounce flat (B*n_items,) arrays; all (0,)
    # when record=False (same pattern as acc_l2)
    rec_p: Any             # dict of (n_items,) arrays or None
    rec_b: Any             # dict of (B*n_items,) arrays or None
    # embedded wide traversal state
    trav: Any              # _WideTravState


def _consts(s: _MkState) -> _TravConsts:
    return _TravConsts(
        tlas_count=s.tlas_count,
        tlas_offset=s.tlas_offset,
        t_link_offset=s.tlas_count,   # unused by the wide path
        org=s.ray_o,
        d=s.ray_d,
        t_inv=s.t_inv,
    )


def _launch(scene, s: _MkState, mask, org: Vec3, d: Vec3, tmin, tmax0,
            phase):
    """Reset the traversal for ``mask`` lanes onto a new ray. ``tmax0`` may
    be per-lane (area shadow rays stop at the sampled light point)."""
    R = s.bounce_i.shape
    t_inv = _safe_inv(d)
    oct_ = _octant(d)
    root = root_cursor(scene, s.tlas_offset, oct_)
    fresh = _wide_init(
        R, mask, jnp.broadcast_to(jnp.asarray(tmax0, jnp.float32), R), root
    )
    return s._replace(
        phase=jnp.where(mask, phase, s.phase),
        ray_o=where3(mask, org, s.ray_o),
        ray_d=where3(mask, d, s.ray_d),
        t_inv=where3(mask, t_inv, s.t_inv),
        tmin=jnp.where(mask, tmin, s.tmin),
        trav=_sel(mask, fresh, s.trav),
    )


def _service(config: RenderConfig, scene, s: _MkState, spp,
             sample_base, n_pixels, pixel_base=0, with_stats=False,
             pixel_order=None):
    """Shade/chain/respawn for lanes whose ray has finished."""
    R = s.bounce_i.shape
    zero = jnp.zeros(R, jnp.float32)
    v0 = Vec3(zero, zero, zero)
    consts = _consts(s)
    trav = s.trav

    use_lights = getattr(scene, "lt_tris", None) is not None
    if use_lights:
        from pathtracing_tpu.ops import arealights

    fin = trav.done & jnp.logical_not(s.lane_done)
    phase0 = s.phase

    # ---- shadow rays completed: record occlusion (the queued bounce — or
    # the chained area shadow — launches in the merged launch below) ----
    sh1_done = fin & (phase0 == _PH_SHADOW)
    occ_nee = jnp.where(sh1_done, trav.occluded, s.occ_nee)
    sh2_done = fin & (phase0 == _PH_SHADOW2)
    occ_area = jnp.where(sh2_done, trav.occluded, s.occ_area)
    s = s._replace(occ_nee=occ_nee, occ_area=occ_area)
    # a finished sun shadow chains to the area shadow when one is pending
    sh1_to_area = sh1_done & (
        s.area.shadow_active if use_lights else jnp.zeros_like(sh1_done)
    )
    sh_done = (sh1_done & jnp.logical_not(sh1_to_area)) | sh2_done
    is_prim = fin & (phase0 == _PH_PRIMARY)
    is_bshade = fin & (phase0 == _PH_BOUNCE)
    shade_m = is_prim | is_bshade

    # ---- materialize the closest hit + shade it (one packed gather;
    # (u, v, t, back) are re-derived inside shade_hit, so no _finalize) ----
    packed = getattr(scene, "tri_shade", None) is not None
    if packed:
        hitm = trav.c_inst >= 0
        from pathtracing_tpu.ops.traversal import RayHit

        hit = RayHit(
            thit=jnp.where(hitm, trav.tmax, -1.0),
            bary_u=zero, bary_v=zero, bary_w=zero,
            inst=trav.c_inst,
            prim=jnp.where(hitm, trav.c_prim, 0),
            back=jnp.zeros_like(hitm),
        )
    else:
        hit = _finalize_hit(scene, consts, trav)
    new_info = shade_hit(
        scene, s.light, hit, s.ray_o, s.ray_d, packed=packed
    )

    # ---- NEE contribution for bounce shades (ordered before the bounce
    # term, exactly as the wavefront body) ----
    atten0 = s.attenuation
    nee_color = nee_finish(
        s.nee, s.light, s.info._replace(roughness=s.roughness), s.occ_nee,
        is_bshade, config,
    )
    cur = s.cur + where3(is_bshade, atten0 * nee_color, v0)
    if use_lights:
        cur = cur + where3(
            is_bshade,
            atten0 * arealights.area_nee_color(s.area, s.occ_area, is_bshade),
            v0,
        )

    # ---- conditional atmosphere draw for the completed closest ray ----
    seed, atmo_att, in_scatter = atmosphere_scattering(
        s.seed, s.light.direction, s.light.color, s.ray_o, s.ray_d,
        new_info.thit, shade_m,
    )

    # ---- contribution terms (reference: path_tracer.hh:686-737) ----
    prim_term = in_scatter + atmo_att * new_info.albedo * new_info.emission
    cur = cur + where3(is_prim, prim_term, v0)
    attenuation = where3(is_prim, atmo_att, atten0)

    pdf_safe = jnp.where(s.b_pdf == 0, 1.0, s.b_pdf)
    mis_pdf = jnp.where(
        s.b_pdf < 0,
        -s.b_pdf,
        jnp.where(
            s.b_pdf == 0,
            jnp.inf,
            (new_info.nee_pdf * new_info.nee_pdf + s.b_pdf * s.b_pdf)
            / pdf_safe,
        ),
    )
    inv_mis = jnp.where(jnp.isinf(mis_pdf), 0.0, 1.0 / mis_pdf)
    inv_abs_pdf = jnp.where(s.b_pdf == 0, jnp.inf, 1.0 / jnp.abs(pdf_safe))
    atten_b = atten0 * s.b_atten
    emission_b = new_info.emission
    if use_lights:
        # light-sampling half of the MIS pair for BSDF-sampled emission
        # hits (primary hits keep full weight via prim_term above)
        pl = arealights.light_pdf_of_hit(
            scene, hit.inst, hit.prim, s.ray_d, new_info.thit, hit.thit >= 0,
        )
        b2 = pdf_safe * pdf_safe
        denom_w = b2 + pl * pl
        emission_b = emission_b * jnp.where(
            s.b_pdf < 0,
            1.0,
            jnp.where(
                denom_w > 0, b2 / jnp.where(denom_w > 0, denom_w, 1.0), 1.0
            ),
        )
    bounce_term = (
        atten_b * (in_scatter + atmo_att * new_info.albedo * emission_b)
        * inv_mis
    )
    cur = cur + where3(is_bshade, bounce_term, v0)
    attenuation = where3(
        is_bshade, atten_b * atmo_att * inv_abs_pdf, attenuation
    )

    # ---- path-space regularization (reference: path_tracer.hh:734-737) ----
    regularization = jnp.where(
        is_bshade & (s.b_pdf > 0.0),
        s.regularization
        * jnp.maximum(
            1.0
            - f32(config.path_space_regularization_gamma)
            / jnp.power(jnp.where(s.b_pdf > 0, s.b_pdf, 1.0), 0.25),
            0.0,
        ),
        jnp.where(is_prim, 1.0, s.regularization),
    )
    roughness = jnp.where(
        shade_m, 1.0 - (1.0 - new_info.roughness) * regularization,
        s.roughness,
    )

    bounce_i = jnp.where(
        is_prim, 1, s.bounce_i + is_bshade.astype(jnp.int32)
    )
    path_live = shade_m & (new_info.thit > 0) & (
        bounce_i <= config.max_bounces
    )
    died = shade_m & jnp.logical_not(path_live)

    # ---- record-mode hit-topology capture (fast gradients): the same
    # per-bounce records path_trace_samples(record=True) emits, scattered
    # by work item so a traversal-free scan replay can differentiate them
    # (diff/render.make_fast_grad_fn). Indexing contract: bounce shade
    # with pre-increment bounce index k writes row k-1 (= the scan's
    # recs[k-1].hit, the hit its bounce ray k produced); a finished sun
    # shadow with s.bounce_i == k writes occ row k-1.
    # Per-lane scatters cost like gathers (tuning.py gather law), so the
    # loop carries a PACKED form — pk = (inst << 2) | (back << 1) | hit —
    # cutting the scatter count per service step from 9 to 5; the final
    # unpack below restores the scan-record format bit-exactly (inst may
    # be a negative sentinel on miss: arithmetic >> 2 preserves it). ----
    rec_p, rec_b = s.rec_p, s.rec_b
    if rec_b:
        n_items_rec = n_pixels * spp
        hit_bit = new_info.thit > 0
        back_bit = hit_bit & (new_info.eta > 1.0)
        pk_val = (
            (hit.inst << 2)
            | (back_bit.astype(jnp.int32) << 1)
            | hit_bit.astype(jnp.int32)
        )
        oob = jnp.int32(n_items_rec * config.max_bounces + 1)
        # every IN-BOUNDS index is a live lane's own item (distinct by the
        # queue contract); all duplicates sit at the dropped oob slot, so
        # unique_indices=True is sound and skips the combiner path
        pidx = jnp.where(is_prim, s.item, oob)
        rec_p = {
            "pk": rec_p["pk"].at[pidx].set(
                pk_val, mode="drop", unique_indices=True),
            "prim": rec_p["prim"].at[pidx].set(
                hit.prim, mode="drop", unique_indices=True),
        }
        bidx = jnp.where(
            is_bshade, (s.bounce_i - 1) * n_items_rec + s.item, oob
        )
        oidx = jnp.where(
            sh1_done, (s.bounce_i - 1) * n_items_rec + s.item, oob
        )
        rec_b = {
            "pk": rec_b["pk"].at[bidx].set(
                pk_val, mode="drop", unique_indices=True),
            "prim": rec_b["prim"].at[bidx].set(
                hit.prim, mode="drop", unique_indices=True),
            "occ": rec_b["occ"].at[oidx].set(
                trav.occluded, mode="drop", unique_indices=True),
        }

    # ---- continue: nee + bsdf draws, launch the shadow ray ----
    info_now = new_info._replace(roughness=roughness)
    view = info_now.tbn.vec_mul(-s.ray_d)
    view = Vec3(
        view.x, view.y,
        jnp.where(view.z < 1e-7, jnp.maximum(view.z, 1e-7), view.z),
    )
    view = normalize3(view)
    seed, nee = nee_prepare(seed, s.light, info_now, view, path_live)
    if use_lights:
        seed, ua = rng.uniform4_masked(seed, path_live)
        area = arealights.sample_area_light(
            scene, ua, info_now, view, path_live
        )
    seed, ub = rng.uniform4_masked(seed, path_live)
    sample = sample_bsdf(
        Vec3(ub.x, ub.y, ub.z), view, info_now.albedo, info_now.roughness,
        info_now.metallic, info_now.transmission, info_now.eta,
    )
    b_dir = normalize3(info_now.tbn.mul_vec(sample.direction))

    # ---- death: fold the sample; take the next item off the queue ----
    n_items = n_pixels * spp
    # scatter-add the dead item's radiance into the per-pixel planes;
    # non-dying lanes target index n_pixels, which mode="drop" discards
    dead_slot = s.item % n_pixels
    dead_local = (
        dead_slot if pixel_order is None else pixel_order[dead_slot]
    )
    dead_pix = jnp.where(died, dead_local, n_pixels)
    # at spp == 1 each in-bounds item IS its pixel (distinct per lane) and
    # all duplicates are the dropped n_pixels slot, so the fold scatter
    # can skip the combiner path; spp is static
    uniq = spp == 1
    acc_r = s.acc_r.at[dead_pix].add(cur.x, mode="drop",
                                     unique_indices=uniq)
    acc_g = s.acc_g.at[dead_pix].add(cur.y, mode="drop",
                                     unique_indices=uniq)
    acc_b = s.acc_b.at[dead_pix].add(cur.z, mode="drop",
                                     unique_indices=uniq)
    if with_stats:
        lum = (
            f32(0.2126) * cur.x + f32(0.7152) * cur.y + f32(0.0722) * cur.z
        )
        acc_l2 = s.acc_l2.at[dead_pix].add(lum * lum, mode="drop",
                                           unique_indices=uniq)
    else:
        acc_l2 = s.acc_l2
    cur = where3(died, v0, cur)

    # shared work queue: each dying lane is granted item
    # next_item + (its rank among this service's deaths) — a cumsum, no
    # atomics, fully deterministic. Items are sample-major so concurrent
    # lanes spread across the whole frame; lanes granted past n_items
    # retire. The queue bounds the ramp-down tail by ONE item's length
    # (the static per-lane interleave left a ~24% lane_done tail).
    died_i = died.astype(jnp.int32)
    rank = jnp.cumsum(died_i) - died_i
    item = jnp.where(died, s.next_item + rank, s.item)
    next_item = s.next_item + jnp.sum(died_i)
    lane_done = s.lane_done | (item >= n_items)
    rs = died & jnp.logical_not(lane_done)
    item_c = jnp.minimum(item, n_items - 1)
    slot_c = item_c % n_pixels
    pixel = pixel_base + (
        slot_c if pixel_order is None else pixel_order[slot_c]
    )
    sample_i = item_c // n_pixels
    W_ = config.image_width
    xs = pixel % W_
    ys = pixel // W_

    sample_index = sample_base + sample_i
    smbs = config.samples_per_motion_blur_step
    subframe = jnp.where(
        sample_index < 0, 0, sample_index // smbs
    ).astype(jnp.int32)
    subframe = jnp.where(rs, subframe, 0)
    fresh_seed = rng.Seed(
        xs.astype(jnp.uint32),
        ys.astype(jnp.uint32),
        sample_index.astype(jnp.uint32),
        jnp.full(R, config.student_id, jnp.uint32),
    )
    fresh_seed = rng.pcg4d(fresh_seed)
    seed = _sel(rs, fresh_seed, seed)
    seed, u = rng.uniform4_masked(seed, rs)
    film = sample_gaussian_weighted_disk(Vec2(u.x, u.y), f32(0.4)) + 0.5
    cam = camera_from_table(scene.sf_cam, subframe)
    coord = Vec2(
        xs.astype(jnp.float32) + film.x, ys.astype(jnp.float32) + film.y
    )
    cam_dir, cam_o = get_camera_ray(
        cam, Vec2(u.z, u.w), coord,
        config.image_width, config.image_height,
    )
    tlas_count = jnp.where(rs, scene.sf_tlas_count[subframe], s.tlas_count)
    tlas_offset = jnp.where(rs, scene.sf_tlas_offset[subframe], s.tlas_offset)
    light = _sel(rs, light_from_table(scene.sf_light, subframe), s.light)

    s = s._replace(
        seed=seed,
        bounce_i=jnp.where(shade_m, bounce_i, s.bounce_i),
        info=_sel(shade_m, new_info, s.info),
        roughness=roughness,
        attenuation=attenuation,
        regularization=regularization,
        cur=cur,
        item=item,
        next_item=next_item,
        acc_r=acc_r,
        acc_g=acc_g,
        acc_b=acc_b,
        acc_l2=acc_l2,
        tlas_count=tlas_count,
        tlas_offset=tlas_offset,
        light=light,
        lane_done=lane_done,
        nee=_sel(path_live, nee, s.nee),
        area=_sel(path_live, area, s.area) if use_lights else s.area,
        b_dir=where3(path_live, b_dir, s.b_dir),
        b_atten=where3(path_live, sample.attenuation, s.b_atten),
        b_pdf=jnp.where(path_live, sample.pdf, s.b_pdf),
        rec_p=rec_p,
        rec_b=rec_b,
    )

    # ---- ONE merged launch (masks are disjoint): finished shadows chain
    # their queued area shadow / bounce, path_live lanes start the next
    # bounce's sun shadow (or skip ahead when NEE is black), rs lanes
    # start the next sample's primary — one octant/root gather for all ----
    to_shadow = path_live & nee.shadow_active
    if use_lights:
        to_area_new = path_live & jnp.logical_not(nee.shadow_active) & (
            area.shadow_active
        )
        to_area = to_area_new | sh1_to_area
        area_dir = where3(sh1_to_area, s.area.wi, area.wi)
        area_dist = jnp.where(sh1_to_area, s.area.dist, area.dist)
    else:
        to_area = jnp.zeros_like(to_shadow)
        area_dir = s.b_dir
        area_dist = jnp.zeros_like(s.tmin)
    mask = sh1_to_area | sh_done | path_live | rs
    l_org = where3(
        rs, cam_o, where3(sh1_to_area | sh_done, s.info.pos, info_now.pos)
    )
    l_dir = where3(
        rs,
        cam_dir,
        where3(
            to_shadow,
            nee.light_dir,
            where3(
                to_area, area_dir, where3(sh_done, s.b_dir, b_dir)
            ),
        ),
    )
    l_tmin = jnp.where(rs, 0.0, jnp.float32(config.min_ray_dist))
    l_tmax = jnp.where(
        to_area, area_dist * (1.0 - 1e-3),
        jnp.float32(config.max_ray_dist),
    )
    l_phase = jnp.where(
        rs,
        _PH_PRIMARY,
        jnp.where(
            to_shadow, _PH_SHADOW,
            jnp.where(to_area, _PH_SHADOW2, _PH_BOUNCE),
        ),
    ).astype(jnp.int32)
    return _launch(
        scene, s, mask, l_org, l_dir, l_tmin, l_tmax, l_phase
    )


def path_trace_megakernel(
    config: RenderConfig,
    scene,
    n_pixels: int,
    spp: int,
    sample_base: int = 0,
    lanes: int = 32768,
    leaf_every: int = DEFAULT_MK_LEAF_EVERY,
    service_div: int | None = None,
    hot_k: int | None = None,
    pixel_base=0,
    with_stats: bool = False,
    return_truncated: bool = False,
    pixel_order=None,
    return_periods: bool = False,
    record: bool = False,
):
    """Whole-frame radiance sums over samples [sample_base, sample_base+spp)
    for pixels [pixel_base, pixel_base + n_pixels) of a
    config.image_width-wide row-major frame, with ``lanes`` persistent lanes
    over n_pixels*spp sample-major work items. Returns a Vec3 of
    (n_pixels,) per-pixel sums. ``pixel_base``/``sample_base`` may be
    traced values — the sharded frame renderer passes per-device offsets
    (parallel/sharding.make_sharded_render_megakernel).

    pixel_order: optional (n_pixels,) int32 permutation — item slot i
    covers pixel pixel_order[i] instead of pixel i. A Morton-curve order
    makes the ~R concurrently-live lanes a compact 2-D tile instead of a
    dozen scanlines, which raises the duplicate-row rate of every
    traversal gather. MEASURED LOSS on the v5e: heavily-duplicated
    indices SERIALIZE (bank conflicts) — Morton ran 3.5x SLOWER at frame
    900 (BENCH_NOTES round-4 gather law; the earlier "same-row gathers
    cost ~0.7 ns" probe reading was a loop-hoisting artifact). Kept for
    other topologies; default off. Radiance is unchanged: seeds depend
    only on (x, y, sample_index) and each pixel's samples stay n_pixels
    items apart (same fold spacing).

    Requires wide tables (scene.wide_rows). Area-light tables (lt_*) are
    supported: lanes chain shade -> sun shadow -> area shadow -> bounce.
    """
    assert getattr(scene, "wide_rows", None) is not None
    if record:
        assert not with_stats, "record mode excludes with_stats"
        assert getattr(scene, "lt_tris", None) is None, (
            "record mode supports the sun-NEE path only"
        )
        assert pixel_order is None, (
            "record mode indexes records by item; replay assumes the "
            "identity item->pixel map"
        )
    R = lanes
    n_items = n_pixels * spp
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]
    item0 = jnp.minimum(lane, n_items - 1)
    slot0 = item0 % n_pixels
    local0 = slot0 if pixel_order is None else pixel_order[slot0]
    pixel0 = pixel_base + local0
    xs = pixel0 % config.image_width
    ys = pixel0 // config.image_width
    i32 = lambda v: jnp.full(R, v, jnp.int32)
    fz = jnp.zeros(R, jnp.float32)
    v0 = Vec3(fz, fz, fz)
    ones = jnp.ones(R, jnp.float32)

    dead_info = HitInfo(
        thit=jnp.full(R, -1.0),
        pos=v0,
        tbn=Mat3(v0, v0, Vec3(fz, fz, ones)),
        albedo=v0,
        alpha=fz,
        roughness=fz,
        metallic=fz,
        emission=fz,
        transmission=fz,
        eta=ones,
        nee_pdf=fz,
    )
    nee0 = NeeState(
        u=Vec4(fz, fz, fz, fz),
        light_dir=Vec3(fz, fz, ones),
        color=v0,
        bsdf_pdf=fz,
        nee_pdf=fz,
        black=jnp.zeros(R, bool),
        shadow_active=jnp.zeros(R, bool),
    )
    from pathtracing_tpu.ops.arealights import AreaSample

    area0 = AreaSample(
        wi=Vec3(fz, fz, ones),
        dist=fz,
        weighted_pdf=fz,
        radiance=v0,
        bsdf=v0,
        shadow_active=jnp.zeros(R, bool),
    )
    state = _MkState(
        seed=rng.Seed(*(jnp.zeros(R, jnp.uint32) for _ in range(4))),
        bounce_i=i32(0),
        info=dead_info,
        roughness=fz,
        attenuation=v0,
        regularization=ones,
        cur=v0,
        item=item0,
        next_item=jnp.int32(R),
        acc_r=jnp.zeros(n_pixels, jnp.float32),
        acc_g=jnp.zeros(n_pixels, jnp.float32),
        acc_b=jnp.zeros(n_pixels, jnp.float32),
        acc_l2=jnp.zeros(n_pixels if with_stats else 0, jnp.float32),
        rec_p={
            "pk": jnp.zeros(n_items, jnp.int32),
            "prim": jnp.zeros(n_items, jnp.int32),
        } if record else {},
        rec_b={
            "pk": jnp.zeros(config.max_bounces * n_items, jnp.int32),
            "prim": jnp.zeros(config.max_bounces * n_items, jnp.int32),
            "occ": jnp.zeros(config.max_bounces * n_items, bool),
        } if record else {},
        tlas_count=i32(1),
        tlas_offset=i32(0),
        light=LightParams(
            direction=Vec3(fz, ones, fz),
            color=v0,
            cos_solid_angle=ones,
        ),
        lane_done=lane >= n_items,
        phase=i32(_PH_PRIMARY),
        ray_o=v0,
        ray_d=Vec3(fz, fz, ones),
        t_inv=_safe_inv(Vec3(fz, fz, ones)),
        tmin=fz,
        nee=nee0,
        occ_nee=jnp.zeros(R, bool),
        area=area0,
        occ_area=jnp.zeros(R, bool),
        b_dir=Vec3(fz, fz, ones),
        b_atten=v0,
        b_pdf=fz,
        trav=_wide_init(
            (R,), jnp.zeros(R, bool), jnp.full(R, 1e9, jnp.float32),
            jnp.full(R, np.uint32(END_TLAS), jnp.uint32),
        ),
    )
    # ---- boot: spawn item L on lane L (same draws as a respawn) ----
    sample_index = sample_base + item0 // n_pixels
    smbs = config.samples_per_motion_blur_step
    subframe = jnp.where(sample_index < 0, 0, sample_index // smbs).astype(
        jnp.int32
    )
    seed = rng.Seed(
        xs.astype(jnp.uint32),
        ys.astype(jnp.uint32),
        sample_index.astype(jnp.uint32),
        jnp.full(R, config.student_id, jnp.uint32),
    )
    boot_live = lane < n_items
    seed = rng.pcg4d(seed)
    seed, u = rng.uniform4_masked(seed, boot_live)
    film = sample_gaussian_weighted_disk(Vec2(u.x, u.y), f32(0.4)) + 0.5
    cam = camera_from_table(scene.sf_cam, subframe)
    coord = Vec2(
        xs.astype(jnp.float32) + film.x, ys.astype(jnp.float32) + film.y
    )
    cam_dir, cam_o = get_camera_ray(
        cam, Vec2(u.z, u.w), coord, config.image_width, config.image_height
    )
    state = state._replace(
        seed=seed,
        tlas_count=scene.sf_tlas_count[subframe],
        tlas_offset=scene.sf_tlas_offset[subframe],
        light=light_from_table(scene.sf_light, subframe),
    )
    state = _launch(
        scene, state, boot_live, cam_o, cam_dir,
        jnp.zeros(R, jnp.float32), config.max_ray_dist,
        jnp.int32(_PH_PRIMARY),
    )

    # Safety bound: a single pathological lane (or a table-corruption
    # cursor cycle) must not spin the while_loop until the TPU worker's
    # watchdog kills the process. ~200 periods per work item per lane is
    # >20x the measured golden-scene depth; hitting the cap abandons the
    # stragglers' partial items (their finished samples are already
    # folded) instead of hanging the chip.
    max_periods = 10_000 + 200 * (-(-n_items // R))

    def cond(c):
        s, period = c
        return jnp.any(jnp.logical_not(s.lane_done)) & (period < max_periods)

    # Adaptive service: the shade/launch block runs only when at least
    # R/SERVICE_DIV lanes have a finished ray waiting — or when no
    # traversal can make progress (drain tail / all-due). On
    # long-traversal tiles (horizon grazing rays) services become rare and
    # the loop degenerates to the pure wide walk; on short-path tiles
    # (sky) they fire every period. This is what drain compaction does
    # for the wavefront renderer, without ever permuting lanes.
    sdiv = SERVICE_DIV if service_div is None else service_div
    # Hot advances (round 5): extra micro-steps whose row gather hits the
    # separate sub-MB scene.hot_rows table (~3 ns/lane vs ~51 on the mega
    # table, tools/onehot_probe.py). Lanes at cold rows freeze — the
    # conservative two-speed deferral, so results are bit-identical for
    # every hot_k (tests/test_hotperm.py). Default: DEFAULT_MK_HOT_K when
    # the scene ships a hot table, else 0.
    hk = hot_k
    if hk is None:
        hk = DEFAULT_MK_HOT_K if getattr(scene, "hot_rows", None) is not None else 0
    # hot_k: int k = k hot advances after every step; tuple (per_step,
    # burst) = per_step after each cheap/full step plus one BURST of
    # ``burst`` back-to-back advances after the full step (consecutive
    # advances amortize the in-context fixed cost — hot_probe pair2).
    per_step, burst = hk if isinstance(hk, tuple) else (hk, 0)
    if (per_step or burst) and getattr(scene, "hot_rows", None) is None:
        raise ValueError("hot_k > 0 needs scene.hot_rows (DevicePacker"
                         "(hot_rows=H) / accel.hotperm)")

    def hot_run(s, k):
        for _ in range(k):
            s = s._replace(
                trav=_wide_cheap_step(scene, s.trav, _consts(s), s.tmin,
                                      hot=True)
            )
        return s

    def body(s):
        consts = _consts(s)
        for _ in range(leaf_every - 1):
            s = s._replace(
                trav=_wide_cheap_step(scene, s.trav, consts, s.tmin)
            )
            s = hot_run(s, per_step)
        anyhit = (s.phase == _PH_SHADOW) | (s.phase == _PH_SHADOW2)
        s = s._replace(
            trav=_wide_step(scene, s.trav, consts, s.tmin, anyhit)
        )
        s = hot_run(s, per_step + burst)
        live = jnp.logical_not(s.lane_done)
        due = jnp.count_nonzero(s.trav.done & live)
        stuck = jnp.count_nonzero(jnp.logical_not(s.trav.done) & live)
        do_service = (due * sdiv >= stuck + due) | (stuck == 0)
        return jax.lax.cond(
            do_service,
            lambda st: _service(config, scene, st, spp, sample_base,
                                n_pixels, pixel_base, with_stats,
                                pixel_order),
            lambda st: st,
            s,
        ), do_service

    def body_c(c):
        s, period, services = c
        s, did = body(s)
        return s, period + 1, services + did.astype(jnp.int32)

    final, end_period, end_services = jax.lax.while_loop(
        lambda c: cond(c[:2]), body_c, (state, jnp.int32(0), jnp.int32(0))
    )
    # the accumulator planes are already per-pixel sums (folded on the fly
    # by the death-time scatter-add)
    acc = Vec3(final.acc_r, final.acc_g, final.acc_b)
    # Cap-hit indicator: lanes still live at exit were abandoned by the
    # max_periods safety bound — their unfolded samples silently darken
    # their pixels, so callers must be able to detect it (render.render_pixels
    # raises; see also the bit-identical-across-knobs contract in tuning.py).
    n_truncated = jnp.count_nonzero(jnp.logical_not(final.lane_done)).astype(
        jnp.int32
    )
    out = (acc, final.acc_l2) if with_stats else (acc,)
    if record:
        B = config.max_bounces

        def unpack(pk, prim, occ):
            return {
                "hit": (pk & 1) != 0,
                "inst": pk >> 2,          # arithmetic: miss sentinel kept
                "prim": prim,
                "back": (pk & 2) != 0,
                "occ": occ,
            }

        rp = unpack(
            final.rec_p["pk"], final.rec_p["prim"],
            jnp.zeros(n_items, bool),      # primary occ: unused by replay
        )
        rb = unpack(
            final.rec_b["pk"], final.rec_b["prim"], final.rec_b["occ"]
        )
        out = out + ((
            rp, {k: v.reshape(B, n_items) for k, v in rb.items()},
        ),)
    if return_truncated:
        out = out + (n_truncated,)
    if return_periods:
        out = out + (end_period, end_services)
    return out if len(out) > 1 else out[0]


def morton_pixel_order(width: int, height: int):
    """(W*H,) int32 pixel ids in Morton (Z-curve) order.

    Feeding this as ``pixel_order`` makes concurrently-live lanes cover a
    compact 2-D tile, maximizing duplicate-row traversal gathers (see
    path_trace_megakernel docstring)."""
    idx = np.arange(width * height, dtype=np.int64)
    x = (idx % width).astype(np.uint64)
    y = (idx // width).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    code = spread(x) | (spread(y) << np.uint64(1))
    return np.argsort(code, kind="stable").astype(np.int32)


# Service fires when due lanes are at least 1/SERVICE_DIV of the live set.
SERVICE_DIV = 8
