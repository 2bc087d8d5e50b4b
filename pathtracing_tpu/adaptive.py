"""Variance-guided adaptive sampling.

The reference renders a fixed SAMPLES_PER_PIXEL everywhere (main.cc:26-38).
This framework extension reallocates a sample budget across pixels by
measured per-pixel variance: a cheap uniform pass estimates the Monte-Carlo
luminance variance, then the remaining budget concentrates on noisy pixels
(sample count proportional to the luminance standard deviation, which
minimizes the summed per-pixel variance for a fixed total).

Bit-compatibility contract: a sample is identified by (x, y, sample_index)
alone (reference: path_tracer.hh:659), so adaptive rendering draws the SAME
radiance values a uniform render would — it only changes how many
consecutive sample indices each pixel consumes. Partial sums therefore merge
with checkpoints and across hosts exactly like uniform sample ranges.

NOTE: sample indices reach `spp_base + max_extra`; the packed scene must
carry subframes for that many samples (scene/loader.setup_animation_frame
packs ceil(spp/8) subframes — pass the intended spp_total).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.render import render_pixels

__all__ = ["allocate_samples", "render_adaptive", "render_with_variance"]

_LUM = (0.2126, 0.7152, 0.0722)  # Rec.709 (reference: math.hh:437-439)


@functools.partial(jax.jit, static_argnums=(0, 4))
def _render_tile_stats(config: RenderConfig, scene, xs, ys, spp: int):
    """Uniform pass accumulating (sum r, g, b, sum lum^2) over spp samples."""

    def body(carry, sample_index):
        r, g, b, l2 = carry
        si = jnp.full(xs.shape, sample_index, jnp.int32)
        c = path_trace_samples(config, scene, xs, ys, si)
        lum = _LUM[0] * c.x + _LUM[1] * c.y + _LUM[2] * c.z
        return (r + c.x, g + c.y, b + c.z, l2 + lum * lum), None

    zero = jnp.zeros(xs.shape, jnp.float32)
    out, _ = jax.lax.scan(
        body, (zero,) * 4, jnp.arange(spp, dtype=jnp.int32)
    )
    return out


@functools.partial(jax.jit, static_argnums=(0, 4))
def _render_tile_stats_wavefront(config: RenderConfig, scene, xs, ys, spp: int):
    """Wavefront (path-regeneration) variant of the stats pass — the TPU
    fast path; per-sample values agree with the scan variant up to chaotic
    boundary lanes (see ops/wavefront.py docstring)."""
    from pathtracing_tpu.ops.wavefront import path_trace_wavefront

    acc, l2 = path_trace_wavefront(
        config, scene, xs, ys, spp, with_stats=True
    )
    return acc.x, acc.y, acc.z, l2


def render_with_variance(
    config: RenderConfig,
    scene,
    xs: np.ndarray,
    ys: np.ndarray,
    spp: int,
    tile_pixels: int | None = None,
):
    """Uniform render that also returns the per-pixel luminance standard
    error of the mean — the noise map the denoiser's range kernel wants.

    Returns (colors (N, 3) f32 averaged, stderr (N,) f32).
    """
    from pathtracing_tpu.render import default_tile_pixels

    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    n = len(xs)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)
    sums = np.empty((n, 3), np.float32)
    lum2 = np.empty(n, np.float32)
    pending = []
    for start in range(0, n, tile_pixels):
        end = min(start + tile_pixels, n)
        pad = tile_pixels - (end - start)
        txs = np.concatenate([xs[start:end], np.zeros(pad, np.int32)])
        tys = np.concatenate([ys[start:end], np.zeros(pad, np.int32)])
        out = _render_tile_stats(
            config, scene, jnp.asarray(txs), jnp.asarray(tys), spp
        )
        pending.append((start, end, out))
    for start, end, (r, g, b, l2) in pending:
        m = end - start
        sums[start:end, 0] = np.asarray(r)[:m]
        sums[start:end, 1] = np.asarray(g)[:m]
        sums[start:end, 2] = np.asarray(b)[:m]
        lum2[start:end] = np.asarray(l2)[:m]
    lum_sum = sums @ np.asarray(_LUM, np.float32)
    var = np.maximum(lum2 - lum_sum * lum_sum / spp, 0.0) / max(spp - 1, 1)
    stderr = np.sqrt(var / spp).astype(np.float32)
    return sums / np.float32(spp), stderr


def allocate_samples(
    var: np.ndarray,
    budget: int,
    max_extra: int | None = None,
) -> np.ndarray:
    """Distribute `budget` extra samples over pixels, ~proportional to the
    luminance standard deviation, quantized to powers of two (so pass 2
    compiles at most log2(max_extra) kernels).

    Returns per-pixel extra counts (int32) with sum <= budget.
    """
    n = len(var)
    if budget <= 0 or n == 0:
        return np.zeros(n, np.int32)
    sigma = np.sqrt(np.maximum(var, 0.0))
    total = sigma.sum()
    if total <= 0:  # flat image: spread uniformly
        flat = int(budget // n)
        return np.full(n, 1 << max(flat.bit_length() - 1, 0) if flat else 0,
                       np.int32)
    if max_extra is None:
        # cap any single pixel at 8x its fair share of the budget
        max_extra = max(8 * budget // n, 2)
    raw = sigma * (budget / total)
    raw = np.minimum(raw, max_extra)
    # floor to power of two (0 stays 0); keeps the distinct-count set tiny
    alloc = np.zeros(n, np.int64)
    pos = raw >= 1.0
    alloc[pos] = 1 << (np.floor(np.log2(raw[pos])).astype(np.int64))
    # flooring frees budget; promote the highest-variance pixels one level
    # until the budget is spent (single pass, largest remainder first)
    spare = budget - int(alloc.sum())
    if spare > 0:
        order = np.argsort(-sigma)
        for i in order:
            step = int(alloc[i]) or 1
            if step <= spare:
                alloc[i] += step
                spare -= step
            if spare <= 0:
                break
    return alloc.astype(np.int32)


def render_adaptive(
    config: RenderConfig,
    scene,
    xs: np.ndarray,
    ys: np.ndarray,
    spp_base: int,
    spp_total: int,
    tile_pixels: int | None = None,
    wavefront: bool = False,
    alloc: np.ndarray | None = None,
):
    """Two-pass adaptive render of a pixel list.

    Pass 1 renders `spp_base` samples everywhere and measures variance;
    pass 2 spends the remaining `(spp_total - spp_base) * N` samples where
    the variance is. Returns (colors (N, 3) f32 averaged, n_samples (N,)
    int32). `alloc` overrides the variance-guided allocation with explicit
    per-pixel extra counts (must be powers of two or 0).
    """
    from pathtracing_tpu.render import default_tile_pixels

    if spp_total < spp_base:
        raise ValueError("spp_total must be >= spp_base")
    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    n = len(xs)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)

    # ---- pass 1: uniform + variance ----
    sums = np.empty((n, 3), np.float32)
    lum2 = np.empty(n, np.float32)
    pending = []
    for start in range(0, n, tile_pixels):
        end = min(start + tile_pixels, n)
        pad = tile_pixels - (end - start)
        txs = np.concatenate([xs[start:end], np.zeros(pad, np.int32)])
        tys = np.concatenate([ys[start:end], np.zeros(pad, np.int32)])
        kernel = (
            _render_tile_stats_wavefront if wavefront else _render_tile_stats
        )
        out = kernel(
            config, scene,
            jnp.asarray(txs), jnp.asarray(tys), spp_base,
        )
        pending.append((start, end, out))
    for start, end, (r, g, b, l2) in pending:
        m = end - start
        sums[start:end, 0] = np.asarray(r)[:m]
        sums[start:end, 1] = np.asarray(g)[:m]
        sums[start:end, 2] = np.asarray(b)[:m]
        lum2[start:end] = np.asarray(l2)[:m]

    counts = np.full(n, spp_base, np.int64)

    if alloc is None:
        budget = (spp_total - spp_base) * n
        if budget > 0:
            lum_sum = sums @ np.asarray(_LUM, np.float32)
            # unbiased per-pixel sample variance of luminance
            var = (lum2 - lum_sum * lum_sum / spp_base) / max(spp_base - 1, 1)
            alloc = allocate_samples(var, budget)
        else:
            alloc = np.zeros(n, np.int32)

    # ---- pass 2: per-bucket extra samples (raw sums, same RNG stream) ----
    for s in np.unique(alloc):
        s = int(s)
        if s == 0:
            continue
        sel = np.nonzero(alloc == s)[0]
        extra = render_pixels(
            config, scene, xs[sel], ys[sel], spp=s,
            tile_pixels=min(tile_pixels, max(len(sel), 1)),
            sample_base=spp_base, average=False, wavefront=wavefront,
        )
        sums[sel] += extra
        counts[sel] += s

    return sums / counts[:, None].astype(np.float32), counts.astype(np.int32)
