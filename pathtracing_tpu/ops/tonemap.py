"""ACES-fit tonemap + sRGB OETF (reference: path_tracer.hh:747-771)."""

from __future__ import annotations

import jax.numpy as jnp

from pathtracing_tpu.utils.vec import Vec3, clamp


def tonemap(color: Vec3):
    """Returns (b, g, r, a) uint8 channels — BGRA order like the reference."""
    c = (color * (2.51 * color + 0.03)) / (color * (2.43 * color + 0.59) + 0.14)

    def srgb(x):
        return jnp.where(
            x < 0.0031308,
            x * 12.92,
            jnp.power(x, 1.0 / 2.4) * 1.055 - 0.055,
        )

    c = Vec3(srgb(c.x), srgb(c.y), srgb(c.z))
    c = Vec3(
        clamp(c.x, 0.0, 1.0), clamp(c.y, 0.0, 1.0), clamp(c.z, 0.0, 1.0)
    )

    def quant(x):
        # C round() = half away from zero; x in [0,1] so floor(x*255 + 0.5)
        return jnp.floor(x * 255.0 + 0.5).astype(jnp.uint8)

    a = jnp.full_like(quant(c.x), 255, dtype=jnp.uint8)
    return quant(c.z), quant(c.y), quant(c.x), a
