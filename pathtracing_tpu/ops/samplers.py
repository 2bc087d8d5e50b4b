"""Sampling primitives (reference: path_tracer.hh:12-83), batched SoA."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.utils.vec import (
    Mat3,
    Vec2,
    Vec3,
    clamp,
    create_tangent_space,
    dot2,
    inv_erf,
    mix,
    where2,
)

_PI = np.float32(np.pi)
_SQRT2 = np.float32(1.41421356)


def sample_gaussian(u, sigma, epsilon):
    """reference: path_tracer.hh:12-17."""
    k = u * 2.0 - 1.0
    k = clamp(k, -(1.0 - epsilon), 1.0 - epsilon)
    return sigma * _SQRT2 * inv_erf(k)


def sample_gaussian_weighted_disk(u: Vec2, sigma) -> Vec2:
    """Film anti-aliasing offset (reference: path_tracer.hh:19-25)."""
    r = jnp.sqrt(u.x)
    theta = 2.0 * _PI * u.y
    r = sample_gaussian(r, sigma, np.float32(1e-6))
    return Vec2(r * jnp.cos(theta), r * jnp.sin(theta))


def sample_cosine_hemisphere(u: Vec2) -> Vec3:
    """reference: path_tracer.hh:27-33."""
    r = jnp.sqrt(u.x)
    theta = 2.0 * _PI * u.y
    d = Vec2(r * jnp.cos(theta), r * jnp.sin(theta))
    return Vec3(d.x, d.y, jnp.sqrt(jnp.maximum(0.0, 1.0 - dot2(d, d))))


def cosine_hemisphere_pdf(dir_z):
    """reference: path_tracer.hh:35-38."""
    return jnp.maximum(dir_z * (1.0 / _PI), 0.0)


def sample_cone(d: Vec3, cos_theta_min, u: Vec2) -> Vec3:
    """Sun-disk cone sample (reference: path_tracer.hh:40-48).

    Gradient guard: at u.x == 0 (a real pcg4d output) cos_theta == 1
    exactly and d sqrt(1-cos^2) is inf — cos_theta_min comes from
    sf_light, so one such lane per frame poisons the whole sf_light
    cotangent (round-5 find; forward value unchanged: sqrt(1)=1 dummy
    only feeds the masked branch)."""
    cos_theta = mix(jnp.float32(1.0), cos_theta_min, u.x)
    s2 = 1.0 - cos_theta * cos_theta
    pos = s2 > 0
    sin_theta = jnp.where(pos, jnp.sqrt(jnp.where(pos, s2, 1.0)), 0.0)
    phi = u.y * 2.0 * _PI
    ts: Mat3 = create_tangent_space(d)
    v = Vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)
    return ts.mul_vec(v)  # mul_m3v3(tangent_space, v)


def sample_regular_polygon(u: Vec2, angle, sides) -> Vec2:
    """Aperture bokeh shape (reference: path_tracer.hh:50-62)."""
    side = jnp.floor(u.x * sides)
    ux = u.x * sides
    ux = ux - jnp.floor(ux)
    side_radians = (2.0 * _PI) / sides
    a1 = side_radians * side + angle
    a2 = side_radians * (side + 1.0) + angle
    b = Vec2(jnp.sin(a1), jnp.cos(a1))
    c = Vec2(jnp.sin(a2), jnp.cos(a2))
    uu = Vec2(ux, u.y)
    uu = where2(uu.x + uu.y > 1.0, 1.0 - uu, uu)
    return b * uu.x + c * uu.y


def sample_ggx_vndf(view: Vec3, roughness, u: Vec2) -> Vec3:
    """Visible-NDF GGX sampling, arXiv 2306.05044 listing
    (reference: path_tracer.hh:64-83). roughness<1e-3 => +Z (delta mirror).
    """
    vx = roughness * view.x
    vy = roughness * view.y
    vz = view.z
    l = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    v = Vec3(vx / l, vy / l, vz / l)

    phi = 2.0 * _PI * u.x
    z = (1.0 - u.y) * (1.0 + v.z) - v.z  # fma in the reference
    z2 = 1.0 - z * z
    zpos = z2 > 0
    sin_theta = jnp.where(
        zpos, jnp.sqrt(clamp(jnp.where(zpos, z2, 1.0), 0.0, 1.0)), 0.0
    )  # same guard: d sqrt at 0 is inf; z == +-1 occurs at u.y in {0, 1}
    x = sin_theta * jnp.cos(phi)
    y = sin_theta * jnp.sin(phi)
    h = Vec3(x + v.x, y + v.y, z + v.z)

    hx = roughness * h.x
    hy = roughness * h.y
    hz = jnp.maximum(0.0, h.z)
    l2 = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    l2 = jnp.where(l2 == 0, 1.0, l2)
    out = Vec3(hx / l2, hy / l2, hz / l2)

    delta = roughness < 1e-3
    zero = jnp.zeros_like(out.x)
    one = jnp.ones_like(out.x)
    return Vec3(
        jnp.where(delta, zero, out.x),
        jnp.where(delta, zero, out.y),
        jnp.where(delta, one, out.z),
    )
