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
    sums, lum2 = _stats_pass(config, scene, xs, ys, spp, tile_pixels, False)
    lum_sum = sums @ np.asarray(_LUM, np.float32)
    var = np.maximum(lum2 - lum_sum * lum_sum / spp, 0.0) / max(spp - 1, 1)
    stderr = np.sqrt(var / spp).astype(np.float32)
    return sums / np.float32(spp), stderr


def _stats_pass(config, scene, xs, ys, spp, tile_pixels, wavefront):
    """Tiled uniform pass returning (sums (N, 3), lum2 (N,))."""
    import jax

    from pathtracing_tpu.render import (
        default_mk_knobs,
        default_tile_pixels,
        megakernel_supported,
        run_tiled,
    )

    if spp < 1:
        raise ValueError("the variance pass needs spp >= 1")
    # the base pass is a full-frame row-major render: route it through the
    # persistent-lane megakernel on TPU when the scene has wide tables
    if jax.default_backend() == "tpu" and megakernel_supported(
        scene, xs, ys, config.image_width
    ):
        from pathtracing_tpu.render import _mk_spp_chunk

        lanes, leaf, sdiv = default_mk_knobs(scene)
        n = len(xs)
        sums = np.zeros((n, 3), np.float32)
        lum2 = np.zeros(n, np.float32)
        # same dispatch wall-clock cap as render_pixels (a single
        # multi-minute dispatch gets the TPU worker killed)
        chunk = _mk_spp_chunk(n, spp, scene, bytes_per_pixel=16)
        for a in range(0, spp, chunk):
            c = min(chunk, spp - a)
            r, g, b, l2 = _render_frame_stats_megakernel(
                config, scene, n, c, _jax_i32(a), lanes, leaf, sdiv
            )
            sums[:, 0] += np.asarray(r)
            sums[:, 1] += np.asarray(g)
            sums[:, 2] += np.asarray(b)
            lum2 += np.asarray(l2)
        return sums, lum2
    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    tile_kernel = (
        _render_tile_stats_wavefront if wavefront else _render_tile_stats
    )
    kernel = lambda txs, tys: tile_kernel(config, scene, txs, tys, spp)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)
    r, g, b, lum2 = run_tiled(kernel, xs, ys, tile_pixels, 4)
    return np.stack([r, g, b], -1), lum2


import functools

import jax as _jax


def _jax_i32(v):
    import jax.numpy as _jnp

    return _jnp.int32(v)


@functools.partial(_jax.jit, static_argnums=(0, 2, 3, 5, 6, 7))
def _render_frame_stats_megakernel(config, scene, n_pixels, spp,
                                   sample_base, lanes, leaf, sdiv):
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    acc, lum2 = path_trace_megakernel(
        config, scene, n_pixels, spp, sample_base, lanes=lanes,
        leaf_every=leaf, service_div=sdiv, with_stats=True,
    )
    return acc.x, acc.y, acc.z, lum2


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
    if not total > 0:  # flat image (or NaN variance): spread uniformly
        flat = int(budget // n)
        if max_extra is not None:
            flat = min(flat, int(max_extra))
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
    # flooring frees budget; promote highest-variance pixels (doubling,
    # clamped at max_extra) in vectorized passes until the budget is spent
    # or every pixel is at the cap; one final partial fill may produce a
    # single non-power-of-two bucket
    spare = budget - int(alloc.sum())
    order = np.argsort(-sigma, kind="stable")
    while spare > 0:
        inc = np.minimum(np.where(alloc > 0, alloc, 1), max_extra - alloc)
        live = order[inc[order] > 0]  # promotable, by descending sigma
        if live.size == 0:
            break
        incs = inc[live]
        c = np.cumsum(incs)
        k = int(np.searchsorted(c, spare, side="right"))
        if k == 0:
            # even the best candidate's doubling exceeds the remaining
            # budget: partial fill (spare < incs[0] <= its cap headroom)
            alloc[live[0]] += spare
            break
        alloc[live[:k]] += incs[:k]
        spare -= int(c[k - 1])
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
    per-pixel extra counts (pass 2 compiles one kernel per distinct
    nonzero count, so keep the distinct-value set small).
    """
    from pathtracing_tpu.render import default_tile_pixels

    if spp_base < 1:
        raise ValueError("spp_base must be >= 1")
    if spp_total < spp_base:
        raise ValueError("spp_total must be >= spp_base")
    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    n = len(xs)
    xs = np.asarray(xs, np.int32)
    ys = np.asarray(ys, np.int32)

    # ---- pass 1: uniform + variance ----
    sums, lum2 = _stats_pass(
        config, scene, xs, ys, spp_base, tile_pixels, wavefront
    )

    counts = np.full(n, spp_base, np.int64)

    if alloc is None:
        budget = (spp_total - spp_base) * n
        if budget > 0:
            lum_sum = sums @ np.asarray(_LUM, np.float32)
            # unbiased per-pixel sample variance of luminance
            var = (lum2 - lum_sum * lum_sum / spp_base) / max(spp_base - 1, 1)
            # never run a pixel past the motion-blur subframes the scene
            # was packed for: extra sample indices live in
            # [spp_base, spp_base + max_extra), and scene.sf_* gathers
            # would silently clamp to the last packed subframe beyond it
            packed_spp = (
                scene.sf_cam.shape[0] * config.samples_per_motion_blur_step
            )
            max_extra = max(packed_spp - spp_base, 0)
            default_cap = max(8 * budget // n, 2)
            alloc = allocate_samples(
                var, budget, max_extra=min(default_cap, max_extra)
            )
        else:
            alloc = np.zeros(n, np.int32)

    # ---- pass 2: per-bucket extra samples (raw sums, same RNG stream;
    # fixed tile size so compiled kernels are reused across frames) ----
    for s in np.unique(alloc):
        s = int(s)
        if s == 0:
            continue
        sel = np.nonzero(alloc == s)[0]
        extra = render_pixels(
            config, scene, xs[sel], ys[sel], spp=s,
            tile_pixels=tile_pixels,
            sample_base=spp_base, average=False, wavefront=wavefront,
        )
        sums[sel] += extra
        counts[sel] += s

    return sums / counts[:, None].astype(np.float32), counts.astype(np.int32)
