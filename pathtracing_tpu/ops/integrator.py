"""The path-tracing integrator (reference: path_tracer.hh:594-741).

``path_trace_samples`` computes a batch of per-sample radiance values with
bit-faithful RNG threading: one warm-up PCG4D step, one film/aperture draw,
then per bounce an NEE draw, a BSDF draw, and a *conditional* atmosphere
draw — lanes that miss or terminate stop consuming their counters exactly
like the reference's scalar control flow (SURVEY.md §3.2).

The bounce loop is a ``lax.scan`` of one compiled bounce body
(MAX_BOUNCES is static); every bounce runs ONE merged wavefront drain —
the any-hit shadow ray and the closest-hit bounce ray of each lane trace
together in a 2R-lane query with a per-lane anyhit mask — with inactive
lanes masked.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops import rng
from pathtracing_tpu.ops.bsdf import bsdf_eval, sample_bsdf
from pathtracing_tpu.ops.camera import camera_from_table, get_camera_ray
from pathtracing_tpu.ops.samplers import sample_cone, sample_gaussian_weighted_disk
from pathtracing_tpu.ops.sky import atmosphere_attenuation, atmosphere_scattering
from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.utils.vec import (
    Mat3,
    Vec2,
    Vec3,
    create_tangent_space,
    dot3,
    length3,
    normalize3,
    where3,
)

Array = Any
f32 = np.float32
_PI = f32(np.pi)
_IOR = f32(1.5)


class LightParams(NamedTuple):
    direction: Vec3
    color: Vec3
    cos_solid_angle: Array


@jax.custom_vjp
def small_table_gather(table: Array, idx: Array) -> Array:
    """``table[idx]`` with a one-hot MXU transpose.

    For tiny per-subframe tables (sf_light (S,7), sf_cam (S,18); S <= a
    few hundred) the reverse-mode transpose of a (R,) gather is a
    scatter-add of R cotangent rows into S rows — maximal index
    duplication, which serializes on the v5e (~2 ms per instance at
    R=230k, BENCH_NOTES round 5). The custom backward computes the same
    sum as onehot(idx)^T @ g on the MXU (~0.6 ms, no serialization).
    Forward values are bit-identical (the same gather); gradient VALUES
    equal the scatter's up to f32 summation order (Precision.HIGHEST
    keeps operand rounding exact)."""
    return table[idx]


def _stg_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _stg_bwd(res, g):
    idx, S = res
    oh = (idx[:, None] == jnp.arange(S, dtype=idx.dtype)[None, :]).astype(
        g.dtype
    )
    gt = jax.lax.dot_general(
        oh, g, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return gt, None


small_table_gather.defvjp(_stg_fwd, _stg_bwd)


def light_from_table(sf_light: Array, idx: Array) -> LightParams:
    l = small_table_gather(sf_light, idx)
    return LightParams(
        direction=Vec3(l[:, 0], l[:, 1], l[:, 2]),
        color=Vec3(l[:, 3], l[:, 4], l[:, 5]),
        cos_solid_angle=l[:, 6],
    )


class HitInfo(NamedTuple):
    """reference: path_tracer.hh:321-338."""

    thit: Array
    pos: Vec3
    tbn: Mat3
    albedo: Vec3
    alpha: Array
    roughness: Array
    metallic: Array
    emission: Array
    transmission: Array
    eta: Array
    nee_pdf: Array


def trace_ray(
    scene,
    light: LightParams,
    tlas_count,
    tlas_offset,
    origin: Vec3,
    d: Vec3,
    tmin,
    active,
) -> HitInfo:
    """Closest-hit trace + shading fetch (reference: path_tracer.hh:340-412)."""
    hit, _ = ray_query(
        scene, tlas_count, tlas_offset, origin, d, tmin, 1e9, active
    )
    return shade_hit(scene, light, hit, origin, d)


@jax.custom_vjp
def _vattr_gather3(vattr: Array, ti3: Array) -> Array:
    """``vattr[ti3]`` (R, 3, 12) with a fused single-scatter transpose."""
    return vattr[ti3]


def _vg3_fwd(vattr, ti3):
    return vattr[ti3], (ti3, vattr.shape[0])


def _vg3_bwd(res, g):
    ti3, V = res
    flat_i = ti3.reshape(-1)                       # (3R,)
    flat_g = g.reshape(-1, g.shape[-1])            # (3R, 12)
    gt = jnp.zeros((V, g.shape[-1]), g.dtype).at[flat_i].add(flat_g)
    return gt, None


_vattr_gather3.defvjp(_vg3_fwd, _vg3_bwd)


def shade_hit(
    scene, light: LightParams, hit, origin: Vec3, d: Vec3,
    packed: bool = False,
) -> HitInfo:
    """Shading fetch for a closest-hit result (reference: path_tracer.hh:356-412).

    packed=True reads the (T, 48) tri_shade rows (scene/device.py
    pack_tri_shade): one gather instead of five, and ``hit.back`` is
    re-derived from the watertight test instead of trusted — used by the
    forward-only renderers. The default path gathers the per-vertex tables
    so gradients land on vattr/tri_pos (diff/render.py).
    """
    miss = hit.thit < 0

    # ---- miss: sun disk (reference: path_tracer.hh:356-366) ----
    visible = (dot3(light.direction, d) > light.cos_solid_angle).astype(
        jnp.float32
    )
    miss_nee_pdf = visible / (2.0 * _PI * (1.0 - light.cos_solid_angle))
    sun_scale = jnp.where(miss_nee_pdf == 0.0, jnp.float32(1.0), miss_nee_pdf)
    miss_albedo = light.color * (visible * sun_scale)

    # ---- hit: interpolate vertex attributes (row gathers) ----
    iidx = jnp.where(miss, 0, hit.inst)
    ui = scene.inst_u[iidx]
    fi = scene.inst_f[iidx]
    tri_row = ui[:, 4] + jnp.where(miss, 0, hit.prim)
    if packed:
        assert scene.tri_shade is not None
        ts_row = scene.tri_shade[tri_row]  # (R, 48)
        a0 = ts_row[:, 0:11]
        a1 = ts_row[:, 11:22]
        a2 = ts_row[:, 22:33]
    else:
        ti = scene.tri_idx[tri_row]  # (R, 4) absolute vertex ids
        # one (R, 3) gather whose AD transpose is ONE (3R, 12) scatter-add
        # instead of three — the TPU scatter op has a ~2.5-4 ms floor per
        # instance at these shapes (BENCH_NOTES round 5), so fusing the
        # three vertex cotangent scatters saves two floors per bounce
        a012 = _vattr_gather3(scene.vattr, ti[:, 0:3])  # (R, 3, 12)
        a0 = a012[:, 0]
        a1 = a012[:, 1]
        a2 = a012[:, 2]

    # Differentiable re-derivation of (u, v, t) at fixed topology: the
    # traversal is discrete (stop_gradient), so the watertight test is
    # recomputed here from the hit ids with differentiable inputs —
    # gradients flow to vertex positions, instance transforms, and the ray.
    from pathtracing_tpu.ops.traversal import _tri_intersect, _tri_preprocess

    bo = Vec3(
        fi[:, 0] * origin.x + fi[:, 3] * origin.y + fi[:, 6] * origin.z + fi[:, 9],
        fi[:, 1] * origin.x + fi[:, 4] * origin.y + fi[:, 7] * origin.z + fi[:, 10],
        fi[:, 2] * origin.x + fi[:, 5] * origin.y + fi[:, 8] * origin.z + fi[:, 11],
    )
    bd = Vec3(
        fi[:, 0] * d.x + fi[:, 3] * d.y + fi[:, 6] * d.z,
        fi[:, 1] * d.x + fi[:, 4] * d.y + fi[:, 7] * d.z,
        fi[:, 2] * d.x + fi[:, 5] * d.y + fi[:, 8] * d.z,
    )
    baxis, bS = _tri_preprocess(bd)
    if packed:
        tp = ts_row[:, 33:42]
    else:
        tp = scene.tri_pos[tri_row]  # (R, 12), differentiable gather
    _, du, dv, dt, dback = _tri_intersect(
        bo, baxis, bS,
        Vec3(tp[:, 0], tp[:, 1], tp[:, 2]),
        Vec3(tp[:, 3], tp[:, 4], tp[:, 5]),
        Vec3(tp[:, 6], tp[:, 7], tp[:, 8]),
    )
    back = (jnp.logical_not(miss) & dback) if packed else hit.back
    thit = jnp.where(miss, hit.thit, dt)
    bu = jnp.where(miss, hit.bary_u, du)
    bv = jnp.where(miss, hit.bary_v, dv)
    bw = 1.0 - bu - bv
    attr = a0 * bu[:, None] + a1 * bv[:, None] + a2 * bw[:, None]
    n = Vec3(attr[:, 0], attr[:, 1], attr[:, 2])
    alb = Vec3(attr[:, 3], attr[:, 4], attr[:, 5])
    alpha = attr[:, 6]
    mat_r = attr[:, 7]
    mat_m = attr[:, 8]
    mat_t = attr[:, 9]
    mat_e = attr[:, 10]

    # rotate normal to world: mul_m3v3(rot, n) with rot = transform 3x3
    # (reference: path_tracer.hh:371,392)
    nw = Vec3(
        fi[:, 12] * n.x + fi[:, 15] * n.y + fi[:, 18] * n.z,
        fi[:, 13] * n.x + fi[:, 16] * n.y + fi[:, 19] * n.z,
        fi[:, 14] * n.x + fi[:, 17] * n.y + fi[:, 20] * n.z,
    )
    # Miss/dead lanes read instance 0's dummy rows; their downstream
    # cotangents can be non-finite (dead-lane ray state is inf/NaN like the
    # reference), and this rotate is the ONLY consumer of the rotation block
    # of inst_f — route those lanes through a constant normal (and guard the
    # normalize operand) so inst_f gradients stay finite. Live-lane values
    # are bit-identical: the where only redirects miss lanes.
    nlen = length3(nw)
    nw = nw / jnp.where(miss | (nlen == 0), jnp.ones_like(nlen), nlen)
    one = jnp.ones_like(nlen)
    nw = where3(miss, Vec3(one * 0.0, one * 0.0, one), nw)

    # IOR 1.5; back-face flips the normal (reference: path_tracer.hh:394-400)
    eta = jnp.where(back, _IOR, 1.0 / _IOR)
    nw = where3(back, -nw, nw)

    tbn = create_tangent_space(nw)
    pos = origin + d * thit

    zero = jnp.zeros_like(hit.thit)
    return HitInfo(
        thit=thit,
        pos=pos,
        tbn=tbn,
        albedo=where3(miss, miss_albedo, alb),
        alpha=jnp.where(miss, zero, alpha),
        roughness=jnp.where(miss, zero, mat_r * mat_r),
        metallic=jnp.where(miss, zero, mat_m),
        emission=jnp.where(miss, jnp.ones_like(zero), mat_e),
        transmission=jnp.where(miss, zero, mat_t),
        eta=jnp.where(miss, jnp.ones_like(zero), eta),
        nee_pdf=jnp.where(miss, miss_nee_pdf, zero),
    )


class NeeState(NamedTuple):
    """nee_prepare -> nee_finish plumbing (split around the shadow trace)."""

    u: Any                # the NEE rand4 draw
    light_dir: Vec3
    color: Vec3           # pre-visibility bsdf*pdf*light color
    bsdf_pdf: Any
    nee_pdf: Any
    black: Any
    shadow_active: Any


def nee_prepare(
    seed: rng.Seed,
    light: LightParams,
    info: HitInfo,
    tview: Vec3,
    active,
) -> tuple:
    """NEE up to (not including) the shadow trace
    (reference: path_tracer.hh:594-609). Returns (seed, NeeState).

    Split from nee_finish so the shadow ray can ride the same wavefront
    drain as the bounce ray (per-lane anyhit in ops/traversal.py).
    Inactive lanes draw nothing.
    """
    seed, u = rng.uniform4_masked(seed, active)
    light_dir = sample_cone(
        light.direction, light.cos_solid_angle, Vec2(u.x, u.y)
    )
    nee_pdf = 1.0 / (2.0 * _PI * (1.0 - light.cos_solid_angle))

    tlight = info.tbn.vec_mul(light_dir)  # mul_v3m3(light_dir, tbn)
    color, bsdf_pdf = bsdf_eval(
        tlight, tview, info.albedo, info.roughness, info.metallic,
        info.transmission, info.eta,
    )
    color = color * nee_pdf * light.color

    black = (color.x == 0) & (color.y == 0) & (color.z == 0)
    # Shadow ray only decides occlusion; lanes already black skip tracing
    # (reference: path_tracer.hh:606-609 short-circuit has no RNG).
    shadow_active = active & jnp.logical_not(black)
    return seed, NeeState(
        u=u, light_dir=light_dir, color=color, bsdf_pdf=bsdf_pdf,
        nee_pdf=nee_pdf, black=black, shadow_active=shadow_active,
    )


def nee_finish(
    st: NeeState,
    light: LightParams,
    info: HitInfo,
    occluded,
    active,
    config: RenderConfig,
) -> Vec3:
    """NEE after the shadow trace: MIS weight + sun transmittance march
    (reference: path_tracer.hh:611-619). The march jitter is the already-
    drawn u.w — no RNG here."""
    dead = st.black | occluded

    mis_pdf = jnp.where(
        light.cos_solid_angle < 1.0,
        (st.nee_pdf * st.nee_pdf + st.bsdf_pdf * st.bsdf_pdf) / st.nee_pdf,
        jnp.float32(1.0),
    )

    color = st.color * atmosphere_attenuation(
        st.u.w, info.pos, st.light_dir,
        jnp.full_like(st.u.w, config.max_ray_dist),
    )
    color = color / mis_pdf

    zero = jnp.zeros_like(color.x)
    live = active & jnp.logical_not(dead)
    return where3(live, color, Vec3(zero, zero, zero))


def camera_sample(config: RenderConfig, scene, xs, ys, sample_index):
    """Seed warm-up, film/aperture draw, and camera ray for one sample per
    lane (reference: path_tracer.hh:655-672). Shared by the integrator and
    the AOV renderer so their RNG streams and primary rays agree exactly.

    Returns (seed, subframe, light, tlas_count, tlas_offset, ray_o, ray_dir).
    """
    subframe = jnp.where(
        sample_index < 0,
        0,
        sample_index // config.samples_per_motion_blur_step,
    ).astype(jnp.int32)

    seed = rng.Seed(
        xs.astype(jnp.uint32),
        ys.astype(jnp.uint32),
        sample_index.astype(jnp.uint32),
        jnp.full_like(xs, config.student_id).astype(jnp.uint32),
    )
    seed = rng.pcg4d(seed)  # warm-up (reference: path_tracer.hh:660)

    seed, u = rng.uniform4(seed)

    film = sample_gaussian_weighted_disk(Vec2(u.x, u.y), f32(0.4)) + 0.5

    cam = camera_from_table(scene.sf_cam, subframe)
    light = light_from_table(scene.sf_light, subframe)
    tlas_count = scene.sf_tlas_count[subframe]
    tlas_offset = scene.sf_tlas_offset[subframe]

    coord = Vec2(
        xs.astype(jnp.float32) + film.x, ys.astype(jnp.float32) + film.y
    )
    ray_dir, ray_o = get_camera_ray(
        cam, Vec2(u.z, u.w), coord, config.image_width, config.image_height
    )
    return seed, subframe, light, tlas_count, tlas_offset, ray_o, ray_dir


def path_trace_samples(
    config: RenderConfig,
    scene,
    xs: Array,
    ys: Array,
    sample_index: Array,
    query_shade=None,
    record: bool = False,
    replay=None,
) -> Vec3:
    """One radiance sample per lane (reference: path_tracer.hh:637-741).

    xs, ys: pixel coordinates (int32); sample_index: int32 (negative =>
    subframe 0, reference: path_tracer.hh:655-657).

    query_shade: optional trace-and-shade override with signature
    (scene, light, tlas_count, tlas_offset, org, d, tmin, tmax, active,
    anyhit, n_shade) -> (occluded over lanes [:N-n_shade], HitInfo over the
    LAST n_shade lanes). The default is ray_query + shade_hit on one
    device; parallel/geomshard.py supplies a version that traces
    shard-local geometry and combines the per-shard closest hits with mesh
    collectives (pmin/psum).

    record/replay: the fast-gradient two-pass protocol (diff/render.py).
    record=True additionally returns the per-bounce hit topology
    (primary_rec, bounce_recs) — each a dict of (R,) / (B, R) arrays with
    the hit ids, back-face bits and shadow occlusion. replay=<records>
    re-runs the SAME radiance computation with every BVH traversal
    replaced by a lookup into those records: traversal was already under
    stop_gradient (fixed-topology gradient model), so differentiating the
    replay gives identical gradients while the AD graph contains zero
    traversal gathers. Shading, RNG threading and the conditional
    atmosphere draws are recomputed bit-identically (the atmosphere
    predicate reads the re-derived thit in both passes).
    """
    # Area-light NEE (ops/arealights.py) auto-enables when the scene was
    # packed with emissive_nee=True. Opt-in: it inserts one extra rand4 draw
    # and one extra any-hit shadow ray per bounce (a DIFFERENT RNG stream
    # from the bit-faithful default) and MIS-weights BSDF-sampled emission.
    use_lights = getattr(scene, "lt_tris", None) is not None
    if use_lights and query_shade is not None:
        raise NotImplementedError(
            "area-light NEE is not supported under a query_shade override "
            "(geometry sharding packs shard scenes without light tables)"
        )
    if (record or replay is not None) and (query_shade or use_lights):
        raise NotImplementedError(
            "record/replay gradients support the default sun-NEE trace only"
        )

    from pathtracing_tpu.ops.traversal import RayHit

    def _rec_of(hit, occluded):
        return {
            "hit": hit.thit >= 0,
            "inst": hit.inst,
            "prim": hit.prim,
            "back": hit.back,
            "occ": occluded,
        }

    def _hit_of(rec):
        one = jnp.ones_like(rec["inst"], jnp.float32)
        return RayHit(
            thit=jnp.where(rec["hit"], one, -one),
            bary_u=0.0 * one, bary_v=0.0 * one, bary_w=one,
            inst=rec["inst"],
            prim=rec["prim"],
            back=rec["back"],
        )

    seed, subframe, light, tlas_count, tlas_offset, ray_o, ray_dir = (
        camera_sample(config, scene, xs, ys, sample_index)
    )

    all_active = jnp.ones_like(xs, dtype=bool)
    prim_rec = None
    if replay is not None:
        info = shade_hit(
            scene, light, _hit_of(replay[0]), ray_o, ray_dir
        )
    elif query_shade is None:
        if record:
            phit, _ = ray_query(
                scene, tlas_count, tlas_offset, ray_o, ray_dir, 0.0, 1e9,
                all_active,
            )
            prim_rec = _rec_of(phit, jnp.zeros_like(all_active))
            info = shade_hit(scene, light, phit, ray_o, ray_dir)
        else:
            info = trace_ray(
                scene, light, tlas_count, tlas_offset, ray_o, ray_dir, 0.0,
                all_active,
            )
    else:
        _, info = query_shade(
            scene, light, tlas_count, tlas_offset, ray_o, ray_dir,
            0.0, 1e9, all_active, False, xs.shape[0],
        )

    one = jnp.ones_like(ray_dir.x)
    zero = jnp.zeros_like(ray_dir.x)
    attenuation = Vec3(one, one, one)
    contribution = Vec3(zero, zero, zero)

    seed, attenuation, in_scatter = atmosphere_scattering(
        seed, light.direction, light.color, ray_o, ray_dir, info.thit, all_active
    )
    contribution = contribution + in_scatter + attenuation * info.albedo * info.emission

    regularization = one
    roughness = info.roughness
    active = all_active

    def bounce_body(carry, xs_in):
        (seed, info, roughness, attenuation, contribution, regularization,
         ray_dir, ray_o, active) = carry
        active = active & (info.thit > 0)

        # tangent-space view (reference: path_tracer.hh:700-702)
        view = info.tbn.vec_mul(-ray_dir)
        view = Vec3(view.x, view.y, jnp.where(view.z < 1e-7, jnp.maximum(view.z, 1e-7), view.z))
        view = normalize3(view)

        info_now = info._replace(roughness=roughness)

        seed, nee = nee_prepare(seed, light, info_now, view, active)

        if use_lights:
            from pathtracing_tpu.ops import arealights

            seed, ua = rng.uniform4_masked(seed, active)
            area = arealights.sample_area_light(
                scene, ua, info_now, view, active
            )

        seed, u = rng.uniform4_masked(seed, active)
        sample = sample_bsdf(
            Vec3(u.x, u.y, u.z), view, info_now.albedo, info_now.roughness,
            info_now.metallic, info_now.transmission, info_now.eta,
        )

        new_dir = normalize3(info.tbn.mul_vec(sample.direction))
        new_o = info.pos
        ray_dir = where3(active, new_dir, ray_dir)
        ray_o = where3(active, new_o, ray_o)

        # One wavefront drain per bounce: the any-hit shadow ray and the
        # closest-hit bounce ray trace together (per-lane anyhit mask),
        # halving the while_loop drains and doubling the population the
        # argsort compaction can balance. RNG order is untouched — both
        # draws above happen before either trace result is consumed.
        R = active.shape[0]
        if use_lights:
            # three rays per lane in one drain: sun shadow, area-light
            # shadow (tmax clipped just short of the sampled point), bounce
            cat = lambda *xs: jnp.concatenate(xs)
            cat3 = lambda *vs: Vec3(
                cat(*(v.x for v in vs)),
                cat(*(v.y for v in vs)),
                cat(*(v.z for v in vs)),
            )
            far = jnp.full(R, config.max_ray_dist, jnp.float32)
            hit3, occ3 = ray_query(
                scene,
                cat(tlas_count, tlas_count, tlas_count),
                cat(tlas_offset, tlas_offset, tlas_offset),
                cat3(info_now.pos, info_now.pos, ray_o),
                cat3(nee.light_dir, area.wi, ray_dir),
                config.min_ray_dist,
                cat(far, area.dist * (1.0 - 1e-3), far),
                cat(nee.shadow_active, area.shadow_active, active),
                anyhit=cat(
                    jnp.ones(2 * R, bool), jnp.zeros(R, bool)
                ),
            )
            occluded = occ3[:R]
            bounce_hit = jax.tree.map(lambda a: a[2 * R :], hit3)
            info = shade_hit(scene, light, bounce_hit, ray_o, ray_dir)
            contribution = contribution + where3(
                active,
                attenuation
                * arealights.area_nee_color(area, occ3[R : 2 * R], active),
                Vec3(zero, zero, zero),
            )
        elif replay is not None:
            occluded = xs_in["occ"]
            bounce_hit = _hit_of(xs_in)
            info = shade_hit(scene, light, bounce_hit, ray_o, ray_dir)
        else:
            cat = lambda a, b: jnp.concatenate([a, b])
            cat3 = lambda a, b: Vec3(cat(a.x, b.x), cat(a.y, b.y), cat(a.z, b.z))
            drain_args = (
                scene,
                cat(tlas_count, tlas_count),
                cat(tlas_offset, tlas_offset),
                cat3(info_now.pos, ray_o),
                cat3(nee.light_dir, ray_dir),
                config.min_ray_dist,
                config.max_ray_dist,
                cat(nee.shadow_active, active),
            )
            anyhit2 = cat(jnp.ones(R, bool), jnp.zeros(R, bool))
            if query_shade is None:
                hit2, occ2 = ray_query(*drain_args, anyhit=anyhit2)
                occluded = occ2[:R]
                bounce_hit = jax.tree.map(lambda a: a[R:], hit2)
                info = shade_hit(scene, light, bounce_hit, ray_o, ray_dir)
            else:
                sc, tc2, to2, org2, dir2, tmn, tmx, act2 = drain_args
                occluded, info = query_shade(
                    sc, light, tc2, to2, org2, dir2, tmn, tmx, act2, anyhit2, R
                )

        nee_color = nee_finish(nee, light, info_now, occluded, active, config)
        contribution = contribution + where3(
            active, attenuation * nee_color, Vec3(zero, zero, zero)
        )

        bsdf_pdf = sample.pdf
        # guarded divisions: pdf==0 lanes keep the reference's inf forward
        # value but contribute zero gradient (inf is a where-constant)
        pdf_safe = jnp.where(bsdf_pdf == 0, 1.0, bsdf_pdf)
        mis_pdf = jnp.where(
            bsdf_pdf < 0,
            -bsdf_pdf,
            jnp.where(
                bsdf_pdf == 0,
                jnp.inf,
                (info.nee_pdf * info.nee_pdf + bsdf_pdf * bsdf_pdf) / pdf_safe,
            ),
        )

        attenuation = where3(
            active, attenuation * sample.attenuation, attenuation
        )

        seed, atmo_att, in_scatter = atmosphere_scattering(
            seed, light.direction, light.color, ray_o, ray_dir, info.thit, active
        )

        inv_mis = jnp.where(jnp.isinf(mis_pdf), 0.0, 1.0 / mis_pdf)
        emission = info.emission
        if use_lights:
            # the light-sampling half of the MIS pair: emission found by
            # BSDF sampling is down-weighted by the pdf with which
            # sample_area_light would have found the same point (delta
            # lobes keep full weight — NEE cannot sample them)
            pl = arealights.light_pdf_of_hit(
                scene, bounce_hit.inst, bounce_hit.prim, ray_dir, info.thit,
                bounce_hit.thit >= 0,
            )
            b2 = pdf_safe * pdf_safe
            denom = b2 + pl * pl
            w_area = jnp.where(
                bsdf_pdf < 0,
                1.0,
                jnp.where(denom > 0, b2 / jnp.where(denom > 0, denom, 1.0), 1.0),
            )
            emission = emission * w_area
        contribution = contribution + where3(
            active,
            attenuation
            * (in_scatter + atmo_att * info.albedo * emission)
            * inv_mis,
            Vec3(zero, zero, zero),
        )
        inv_abs_pdf = jnp.where(bsdf_pdf == 0, jnp.inf, 1.0 / jnp.abs(pdf_safe))
        attenuation = where3(
            active, attenuation * atmo_att * inv_abs_pdf, attenuation
        )

        # path-space regularization (reference: path_tracer.hh:734-737)
        regularization = jnp.where(
            active & (bsdf_pdf > 0.0),
            regularization
            * jnp.maximum(
                1.0
                - f32(config.path_space_regularization_gamma)
                / jnp.power(jnp.where(bsdf_pdf > 0, bsdf_pdf, 1.0), 0.25),
                0.0,
            ),
            regularization,
        )
        roughness = 1.0 - (1.0 - info.roughness) * regularization

        return (
            seed, info, roughness, attenuation, contribution, regularization,
            ray_dir, ray_o, active,
        ), (_rec_of(bounce_hit, occluded) if record else None)

    # One compiled bounce body scanned max_bounces times (identical
    # structure per bounce; cuts compile time vs unrolling).
    carry = (
        seed, info, roughness, attenuation, contribution, regularization,
        ray_dir, ray_o, active,
    )
    carry, recs = jax.lax.scan(
        bounce_body, carry,
        replay[1] if replay is not None else None,
        length=config.max_bounces,
    )
    contribution = carry[4]

    if record:
        return contribution, (prim_rec, recs)
    return contribution
