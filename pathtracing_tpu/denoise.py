"""AOV-guided joint-bilateral denoiser.

A compile-friendly fixed-footprint filter for Monte-Carlo noise: each pixel
averages its (2r+1)^2 neighborhood with weights from the primary-hit AOV
buffers (pathtracing_tpu/aov.py) — neighbors only contribute where albedo,
shading normal, and depth agree, so geometric and material edges survive
while flat-region noise averages out.

No reference equivalent (the reference outputs raw accumulations,
main.cc:42-46); this is a framework extension that pairs with adaptive
sampling for a fast-preview workflow: low spp + AOVs + denoise. It is a
biased variance-for-blur trade targeted at NOISY (low-spp) previews — on a
near-converged image the edge-stopping blur floor exceeds the residual
noise, so final frames should come from more samples, not this filter.

TPU notes: the kernel is (2r+1)^2 statically-unrolled shifted adds over the
(H, W) image — pure fused elementwise VPU work, no gathers, no
data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["joint_bilateral_denoise"]


_LUM = (0.2126, 0.7152, 0.0722)  # Rec.709 (reference: math.hh:437-439)


@functools.partial(jax.jit, static_argnums=(3,))
def _denoise(colors, guides, noise, radius: int, sigmas):
    albedo, normal, depth, coverage = guides
    sigma_spatial, sigma_albedo, sigma_normal, sigma_depth, k_noise = sigmas

    H, W = depth.shape
    r = radius
    pad = lambda a: jnp.pad(
        a, [(r, r), (r, r)] + [(0, 0)] * (a.ndim - 2), mode="edge"
    )
    lum = (
        _LUM[0] * colors[..., 0]
        + _LUM[1] * colors[..., 1]
        + _LUM[2] * colors[..., 2]
    )
    pc, pa, pn, pd, pv, pl, ps = (
        pad(colors), pad(albedo), pad(normal), pad(depth), pad(coverage),
        pad(lum), pad(noise),
    )

    # depth similarity is relative to the local scale (distant geometry has
    # proportionally larger z deltas)
    z_scale = jnp.maximum(jnp.abs(depth), 1e-3)

    acc = jnp.zeros_like(colors)
    wsum = jnp.zeros_like(depth)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            oy, ox = dy + r, dx + r
            sc = pc[oy : oy + H, ox : ox + W]
            sa = pa[oy : oy + H, ox : ox + W]
            sn = pn[oy : oy + H, ox : ox + W]
            sd = pd[oy : oy + H, ox : ox + W]
            sv = pv[oy : oy + H, ox : ox + W]
            sl = pl[oy : oy + H, ox : ox + W]
            ss = ps[oy : oy + H, ox : ox + W]

            w = jnp.exp(
                -(dx * dx + dy * dy) / (2.0 * sigma_spatial * sigma_spatial)
            )
            da2 = jnp.sum((sa - albedo) ** 2, axis=-1)
            w = w * jnp.exp(-da2 / (2.0 * sigma_albedo * sigma_albedo))
            ndot = jnp.sum(sn * normal, axis=-1)
            w = w * jnp.exp(-(1.0 - ndot) / jnp.maximum(sigma_normal, 1e-6))
            dz = (sd - depth) / z_scale
            w = w * jnp.exp(-(dz * dz) / (2.0 * sigma_depth * sigma_depth))
            # sky<->surface boundaries: only mix alike coverage
            w = w * jnp.exp(-8.0 * jnp.abs(sv - coverage))
            # noise-scaled radiance range kernel: neighbors whose luminance
            # differs by much more than the Monte-Carlo noise level are
            # real illumination edges (shadows, caustics) the primary-hit
            # guides cannot see; as noise -> 0 the filter -> identity
            sig = k_noise * jnp.maximum(jnp.maximum(ss, ps[r : r + H, r : r + W]), 1e-20)
            dl = (sl - lum) / sig
            w = w * jnp.exp(-0.5 * dl * dl)

            acc = acc + sc * w[..., None]
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-20)[..., None]


def joint_bilateral_denoise(
    colors: np.ndarray,
    aovs: dict,
    noise: np.ndarray | None = None,
    radius: int = 2,
    sigma_spatial: float = 2.0,
    sigma_albedo: float = 0.1,
    sigma_normal: float = 0.05,
    sigma_depth: float = 0.05,
    k_noise: float = 2.0,
):
    """Denoise an (H, W, 3) radiance image using its AOV buffers.

    aovs: dict with 'albedo' (H, W, 3), 'normal' (H, W, 3), 'depth' (H, W),
    'coverage' (H, W) — the shapes render_aovs produces reshaped to the
    frame. noise: optional (H, W) per-pixel luminance standard ERROR of the
    pixel mean (adaptive.render_with_variance returns it); when given, a
    radiance range kernel rejects neighbors more than ~k_noise standard
    errors apart, preserving illumination edges the guides can't see and
    making the filter converge to identity as spp grows. Returns (H, W, 3)
    float32.
    """
    if noise is None:
        nz = jnp.full(colors.shape[:2], jnp.inf, jnp.float32)  # disabled
    else:
        nz = jnp.asarray(noise, jnp.float32)
    out = _denoise(
        jnp.asarray(colors, jnp.float32),
        (
            jnp.asarray(aovs["albedo"], jnp.float32),
            jnp.asarray(aovs["normal"], jnp.float32),
            jnp.asarray(aovs["depth"], jnp.float32),
            jnp.asarray(aovs["coverage"], jnp.float32),
        ),
        nz,
        int(radius),
        (
            jnp.float32(sigma_spatial),
            jnp.float32(sigma_albedo),
            jnp.float32(sigma_normal),
            jnp.float32(sigma_depth),
            jnp.float32(k_noise),
        ),
    )
    return np.asarray(out)
