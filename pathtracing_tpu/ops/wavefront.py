"""Wavefront path tracer with path regeneration.

The scan renderer (ops/integrator.py + render._render_tile) runs every
bounce for every lane: by bounce 3-4 most paths have already escaped to the
sky, so 30-60% of the bounce work (trace + BSDF + atmosphere march) is
masked-off waste. Here each lane owns one pixel and streams its samples
through a persistent loop: the moment a path dies, the lane respawns the
pixel's NEXT sample (camera ray) in the same iteration, so occupancy stays
~100% until the tail.

Semantics are the reference's exactly (reference: path_tracer.hh:637-741):
each lane's draw sequence is film; [primary]; cond-atmo; then per bounce
nee, bsdf, cond-atmo — identical to the scan renderer because seeds are
per-lane and draws are masked. Scenes packed with emissive_nee=True get
the same area-light NEE extension as the scan integrator (one extra
masked draw + shadow ray per bounce, ops/arealights.py), again with a
draw order identical to it. Per-pixel accumulation happens in sample
order (a sample's contribution folds into the accumulator when its path
dies), matching the tile renderer's addition order; residual differences
are kernel-fusion ulps only (golden-tested in tests/test_wavefront.py).

Forward rendering only: the dynamic-trip-count while_loop is not
reverse-differentiable — diff/render.py stays on the scan integrator.
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
    light_from_table,
    nee_finish,
    nee_prepare,
    shade_hit,
)
from pathtracing_tpu.ops.samplers import sample_gaussian_weighted_disk
from pathtracing_tpu.ops.sky import atmosphere_scattering
from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.utils.vec import Vec2, Vec3, normalize3, where3

Array = Any
f32 = np.float32


def _sel(mask, new, old):
    return jax.tree.map(lambda a, b: jnp.where(mask, a, b), new, old)


def _sel3(mask, new, old) -> Vec3:
    return where3(mask, new, old)


class _WfState(NamedTuple):
    seed: rng.Seed
    sample_i: Array        # next sample ordinal for this lane's pixel
    path_live: Array       # bool: a path is mid-flight
    bounce_i: Array        # 1 after the primary hit; bounces run 1..max_bounces
    info: HitInfo          # previous hit (shading context for the next bounce)
    roughness: Array       # path-space-regularized roughness
    attenuation: Vec3
    regularization: Array
    ray_o: Vec3
    ray_dir: Vec3
    cur: Vec3              # current sample's radiance (folded into acc at death)
    acc: Vec3              # per-pixel sums over completed samples
    acc_l2: Array          # per-pixel sums of luminance^2 when with_stats
                           # (else a zero-length array: no carry cost)
    tlas_count: Array
    tlas_offset: Array
    light: LightParams


def path_trace_wavefront(
    config: RenderConfig,
    scene,
    xs: Array,
    ys: Array,
    spp: int,
    sample_base: int = 0,
    with_stats: bool = False,
):
    """Per-pixel radiance sums over samples [sample_base, sample_base+spp).

    xs/ys: flat pixel coordinates, one lane per pixel. Returns Vec3 of sums
    (divide by spp for the average), identical semantics to summing
    path_trace_samples over the same sample range. with_stats=True returns
    (sums, lum2) where lum2 is the per-pixel sum of squared per-sample
    luminance — what adaptive sampling's variance pass needs
    (pathtracing_tpu/adaptive.py) at wavefront speed.
    """
    R = xs.shape[0]
    i32 = lambda v: jnp.full(R, v, jnp.int32)
    fz = jnp.zeros(R, jnp.float32)
    v0 = Vec3(fz, fz, fz)

    # area-light NEE (ops/arealights.py): same opt-in and draw order as the
    # scan integrator — one extra rand4 + one extra any-hit ray per bounce
    use_lights = getattr(scene, "lt_tris", None) is not None
    if use_lights:
        from pathtracing_tpu.ops import arealights

    xs = jnp.asarray(xs, jnp.int32)
    ys = jnp.asarray(ys, jnp.int32)

    from pathtracing_tpu.utils.vec import Mat3

    # placeholder hit for lanes before their first trace (never shaded)
    dead_info = HitInfo(
        thit=jnp.full(R, -1.0),
        pos=v0,
        tbn=Mat3(v0, v0, Vec3(fz, fz, jnp.ones(R, jnp.float32))),
        albedo=v0,
        alpha=fz,
        roughness=fz,
        metallic=fz,
        emission=fz,
        transmission=fz,
        eta=jnp.ones(R, jnp.float32),
        nee_pdf=fz,
    )

    state = _WfState(
        seed=rng.Seed(*(jnp.zeros(R, jnp.uint32) for _ in range(4))),
        sample_i=i32(0),
        path_live=jnp.zeros(R, bool),
        bounce_i=i32(0),
        info=dead_info,
        roughness=fz,
        attenuation=Vec3(fz, fz, fz),
        regularization=jnp.ones(R, jnp.float32),
        ray_o=v0,
        ray_dir=Vec3(fz, fz, jnp.ones(R, jnp.float32)),
        cur=v0,
        acc=v0,
        acc_l2=fz if with_stats else jnp.zeros((0,), jnp.float32),
        tlas_count=i32(1),
        tlas_offset=i32(0),
        light=LightParams(
            direction=Vec3(fz, jnp.ones(R, jnp.float32), fz),
            color=v0,
            cos_solid_angle=jnp.ones(R, jnp.float32),
        ),
    )

    smbs = config.samples_per_motion_blur_step
    zero = fz

    def cond(s):
        return jnp.any(s.path_live | (s.sample_i < spp))

    def body(s):
        # ---- respawn: dead lanes pull their pixel's next sample ----
        rs = jnp.logical_not(s.path_live) & (s.sample_i < spp)
        sample_index = sample_base + s.sample_i
        subframe = jnp.where(
            sample_index < 0, 0, sample_index // smbs
        ).astype(jnp.int32)
        subframe = jnp.where(rs, subframe, 0)

        fresh = rng.Seed(
            xs.astype(jnp.uint32),
            ys.astype(jnp.uint32),
            sample_index.astype(jnp.uint32),
            jnp.full(R, config.student_id, jnp.uint32),
        )
        fresh = rng.pcg4d(fresh)  # warm-up (reference: path_tracer.hh:660)
        seed = _sel(rs, fresh, s.seed)

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

        live = s.path_live | rs
        cont = s.path_live  # lanes doing bounce #bounce_i this iteration

        # ---- NEE + BSDF draws for continuing lanes (reference order) ----
        view = s.info.tbn.vec_mul(-s.ray_dir)
        view = Vec3(
            view.x, view.y,
            jnp.where(view.z < 1e-7, jnp.maximum(view.z, 1e-7), view.z),
        )
        view = normalize3(view)
        info_now = s.info._replace(roughness=s.roughness)

        seed, nee = nee_prepare(seed, light, info_now, view, cont)

        if use_lights:
            seed, ua = rng.uniform4_masked(seed, cont)
            area = arealights.sample_area_light(scene, ua, info_now, view, cont)

        seed, ub = rng.uniform4_masked(seed, cont)
        sample = sample_bsdf(
            Vec3(ub.x, ub.y, ub.z), view, info_now.albedo, info_now.roughness,
            info_now.metallic, info_now.transmission, info_now.eta,
        )
        b_dir = normalize3(s.info.tbn.mul_vec(sample.direction))

        ray_o = _sel3(rs, cam_o, _sel3(cont, s.info.pos, s.ray_o))
        ray_dir = _sel3(rs, cam_dir, _sel3(cont, b_dir, s.ray_dir))

        # ---- one merged drain: shadow half/halves (anyhit) + closest ----
        tmin_closest = jnp.where(rs, 0.0, f32(config.min_ray_dist))
        near = jnp.full(R, config.min_ray_dist, jnp.float32)
        far = jnp.full(R, config.max_ray_dist, jnp.float32)
        if use_lights:
            cat = lambda *xs: jnp.concatenate(xs)
            cat3 = lambda *vs: Vec3(
                cat(*(v.x for v in vs)),
                cat(*(v.y for v in vs)),
                cat(*(v.z for v in vs)),
            )
            hitq, occq = ray_query(
                scene,
                cat(tlas_count, tlas_count, tlas_count),
                cat(tlas_offset, tlas_offset, tlas_offset),
                cat3(info_now.pos, info_now.pos, ray_o),
                cat3(nee.light_dir, area.wi, ray_dir),
                cat(near, near, tmin_closest),
                cat(far, area.dist * (1.0 - 1e-3), far),
                cat(nee.shadow_active, area.shadow_active, live),
                anyhit=cat(jnp.ones(2 * R, bool), jnp.zeros(R, bool)),
            )
            n_shadow = 2 * R
        else:
            cat = lambda a, b: jnp.concatenate([a, b])
            cat3 = lambda a, b: Vec3(cat(a.x, b.x), cat(a.y, b.y), cat(a.z, b.z))
            hitq, occq = ray_query(
                scene,
                cat(tlas_count, tlas_count),
                cat(tlas_offset, tlas_offset),
                cat3(info_now.pos, ray_o),
                cat3(nee.light_dir, ray_dir),
                cat(near, tmin_closest),
                config.max_ray_dist,
                cat(nee.shadow_active, live),
                anyhit=cat(jnp.ones(R, bool), jnp.zeros(R, bool)),
            )
            n_shadow = R
        occluded = occq[:R]
        bounce_hit = jax.tree.map(lambda a: a[n_shadow:], hitq)
        new_info = shade_hit(scene, light, bounce_hit, ray_o, ray_dir)

        # NEE contribution lands before the bounce term (scan-body order)
        nee_color = nee_finish(nee, light, info_now, occluded, cont, config)
        cur = s.cur + where3(
            cont, s.attenuation * nee_color, Vec3(zero, zero, zero)
        )
        if use_lights:
            cur = cur + where3(
                cont,
                s.attenuation
                * arealights.area_nee_color(area, occq[R : 2 * R], cont),
                Vec3(zero, zero, zero),
            )

        # ---- atmosphere (conditional draw) + contribution ----
        seed, atmo_att, in_scatter = atmosphere_scattering(
            seed, light.direction, light.color, ray_o, ray_dir,
            new_info.thit, live,
        )

        bsdf_pdf = sample.pdf
        pdf_safe = jnp.where(bsdf_pdf == 0, 1.0, bsdf_pdf)
        mis_pdf = jnp.where(
            bsdf_pdf < 0,
            -bsdf_pdf,
            jnp.where(
                bsdf_pdf == 0,
                jnp.inf,
                (new_info.nee_pdf * new_info.nee_pdf + bsdf_pdf * bsdf_pdf)
                / pdf_safe,
            ),
        )
        inv_mis = jnp.where(jnp.isinf(mis_pdf), 0.0, 1.0 / mis_pdf)
        inv_abs_pdf = jnp.where(bsdf_pdf == 0, jnp.inf, 1.0 / jnp.abs(pdf_safe))

        attenuation = _sel3(
            cont, s.attenuation * sample.attenuation, s.attenuation
        )
        # primary: contribution = in_scatter + atmo*albedo*emission, path
        # throughput starts at the atmosphere attenuation
        # (reference: path_tracer.hh:686-693)
        prim_term = in_scatter + atmo_att * new_info.albedo * new_info.emission
        emission = new_info.emission
        if use_lights:
            # light-sampling half of the MIS pair for BSDF-sampled emission
            # hits (primary hits keep full weight via prim_term above)
            pl = arealights.light_pdf_of_hit(
                scene, bounce_hit.inst, bounce_hit.prim, ray_dir,
                new_info.thit, bounce_hit.thit >= 0,
            )
            b2 = pdf_safe * pdf_safe
            denom_w = b2 + pl * pl
            emission = emission * jnp.where(
                bsdf_pdf < 0,
                1.0,
                jnp.where(
                    denom_w > 0, b2 / jnp.where(denom_w > 0, denom_w, 1.0), 1.0
                ),
            )
        bounce_term = (
            attenuation
            * (in_scatter + atmo_att * new_info.albedo * emission)
            * inv_mis
        )
        cur = cur + where3(
            rs, prim_term, where3(cont, bounce_term, Vec3(zero, zero, zero))
        )
        attenuation = _sel3(rs, atmo_att, attenuation)
        attenuation = _sel3(
            cont, attenuation * atmo_att * inv_abs_pdf, attenuation
        )

        # ---- path-space regularization (reference: path_tracer.hh:734-737) ----
        regularization = jnp.where(
            cont & (bsdf_pdf > 0.0),
            s.regularization
            * jnp.maximum(
                1.0
                - f32(config.path_space_regularization_gamma)
                / jnp.power(jnp.where(bsdf_pdf > 0, bsdf_pdf, 1.0), 0.25),
                0.0,
            ),
            jnp.where(rs, 1.0, s.regularization),
        )
        roughness = 1.0 - (1.0 - new_info.roughness) * regularization

        # ---- advance / retire ----
        bounce_i = jnp.where(rs, 1, s.bounce_i + cont.astype(jnp.int32))
        path_live = live & (new_info.thit > 0) & (bounce_i <= config.max_bounces)
        died = live & jnp.logical_not(path_live)
        acc = s.acc + where3(died, cur, Vec3(zero, zero, zero))
        if with_stats:
            lum = (
                f32(0.2126) * cur.x + f32(0.7152) * cur.y
                + f32(0.0722) * cur.z
            )
            acc_l2 = s.acc_l2 + jnp.where(died, lum * lum, zero)
        else:
            acc_l2 = s.acc_l2
        cur = where3(died, Vec3(zero, zero, zero), cur)

        return _WfState(
            seed=seed,
            sample_i=s.sample_i + rs.astype(jnp.int32),
            path_live=path_live,
            bounce_i=bounce_i,
            info=_sel(live, new_info, s.info),
            roughness=jnp.where(live, roughness, s.roughness),
            attenuation=attenuation,
            regularization=regularization,
            ray_o=ray_o,
            ray_dir=ray_dir,
            cur=cur,
            acc=acc,
            acc_l2=acc_l2,
            tlas_count=tlas_count,
            tlas_offset=tlas_offset,
            light=light,
        )

    final = jax.lax.while_loop(cond, body, state)
    if with_stats:
        return final.acc, final.acc_l2
    return final.acc
