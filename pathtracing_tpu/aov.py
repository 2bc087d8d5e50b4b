"""Arbitrary output variables (AOVs): per-pixel albedo / normal / depth
buffers from the primary hit.

The reference has no AOV support (its only output is the beauty pass,
main.cc:42-46); this is a framework extension for denoising and debugging
workflows. The AOV pass reuses the integrator's exact camera sampling
(ops/integrator.camera_sample — same PCG4D stream, same film-jitter and
aperture draws, reference: path_tracer.hh:655-672), so AOV buffers are
pixel-aligned with the beauty pass including depth of field and motion-blur
subframe selection.

Channels (all averaged over the sample range):
  albedo   (N, 3) — primary-hit surface albedo; 0 where the ray misses
  normal   (N, 3) — world-space shading normal (TBN row 2); 0 on miss
  depth    (N,)   — hit distance along the (unnormalized-by-instance-scale
                    corrected) primary ray; mean over hitting samples only
  coverage (N,)   — fraction of samples whose primary ray hit geometry
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import camera_sample, light_from_table, trace_ray
from pathtracing_tpu.utils.vec import Vec3

__all__ = ["aov_samples", "render_aovs"]


def aov_samples(config: RenderConfig, scene, xs, ys, sample_index):
    """One primary-hit AOV sample per lane.

    Returns (albedo Vec3, normal Vec3, depth, hit_mask) with miss lanes
    zeroed (depth 0 on miss; combine with hit_mask for averages).
    """
    _, _, light, tlas_count, tlas_offset, ray_o, ray_dir = camera_sample(
        config, scene, xs, ys, sample_index
    )
    active = jnp.ones_like(xs, dtype=bool)
    info = trace_ray(
        scene, light, tlas_count, tlas_offset, ray_o, ray_dir, 0.0, active
    )
    hit = info.thit > 0
    zero = jnp.zeros_like(info.thit)

    def keep3(v):
        return Vec3(
            jnp.where(hit, v.x, zero),
            jnp.where(hit, v.y, zero),
            jnp.where(hit, v.z, zero),
        )

    albedo = keep3(info.albedo)
    normal = keep3(info.tbn.r2)  # TBN rows = {tangent, bitangent, normal}
    depth = jnp.where(hit, info.thit, zero)
    return albedo, normal, depth, hit


@functools.partial(jax.jit, static_argnums=(0, 4))
def _aov_tile(config: RenderConfig, scene, xs, ys, spp: int):
    def body(carry, sample_index):
        (ar, ag, ab, nx, ny, nz, d, h) = carry
        si = jnp.full(xs.shape, sample_index, jnp.int32)
        alb, nrm, dep, hit = aov_samples(config, scene, xs, ys, si)
        hf = hit.astype(jnp.float32)
        return (
            ar + alb.x, ag + alb.y, ab + alb.z,
            nx + nrm.x, ny + nrm.y, nz + nrm.z,
            d + dep, h + hf,
        ), None

    zero = jnp.zeros(xs.shape, jnp.float32)
    out, _ = jax.lax.scan(
        body, (zero,) * 8, jnp.arange(spp, dtype=jnp.int32)
    )
    return out


def render_aovs(
    config: RenderConfig,
    scene,
    xs: np.ndarray,
    ys: np.ndarray,
    spp: int = 8,
    tile_pixels: int | None = None,
):
    """AOV buffers for an arbitrary pixel list.

    Returns a dict: albedo (N, 3), normal (N, 3) (renormalized mean),
    depth (N,) (mean over hitting samples; 0 where nothing hit),
    coverage (N,) in [0, 1].
    """
    from pathtracing_tpu.render import default_tile_pixels, run_tiled

    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)
    kernel = lambda txs, tys: _aov_tile(config, scene, txs, tys, spp)
    ar, ag, ab, nx, ny, nz, d, h = run_tiled(kernel, xs, ys, tile_pixels, 8)
    inv_spp = np.float32(1.0 / spp)
    hits = np.maximum(h, 1.0)
    normal = np.stack([nx, ny, nz], -1)
    norm = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / np.maximum(norm, 1e-20)
    return {
        "albedo": np.stack([ar, ag, ab], -1) * inv_spp,
        "normal": normal.astype(np.float32),
        "depth": (d / hits).astype(np.float32),
        "coverage": (h * inv_spp).astype(np.float32),
    }
