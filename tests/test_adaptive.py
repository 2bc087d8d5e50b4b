"""Adaptive sampling (pathtracing_tpu/adaptive.py) — framework extension.

Everything here is deterministic: a sample is keyed by (x, y, sample_index)
(reference: path_tracer.hh:659), so adaptive and uniform renders draw from
the same sample set and MSE comparisons are exact, not statistical.
"""

import numpy as np
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.adaptive import allocate_samples, render_adaptive
from pathtracing_tpu.render import render_pixels

from golden_scene import scene_device_from_golden
from pathtracing_tpu.utils.goldenio import load_golden


@pytest.fixture(scope="module")
def scene(golden_dir):
    return scene_device_from_golden(load_golden(str(golden_dir / "scene.gold")))


def _grid(w=40, h=24):
    idx = np.arange(w * h, dtype=np.int32)
    return (idx % w) * (640 // w), (idx // w) * (360 // h)


def test_allocate_samples_properties():
    var = np.array([0.0, 1.0, 4.0, 16.0, 0.25])
    alloc = allocate_samples(var, budget=40)
    assert alloc.sum() <= 40
    # the bucket set stays tiny (pow-2 levels + at most one partial fill)
    assert len(set(alloc[alloc > 0])) <= int(np.log2(40)) + 2
    # monotone in variance (after quantization)
    order = np.argsort(var)
    assert (np.diff(alloc[order]) >= 0).all()
    # flat variance spreads uniformly
    flat = allocate_samples(np.zeros(8), budget=32)
    assert (flat == 4).all()
    assert allocate_samples(var, budget=0).sum() == 0


def test_allocate_samples_spends_budget_under_cap():
    """The promotion passes spend the whole budget even when the per-pixel
    cap binds (every pixel can absorb it)."""
    var = np.linspace(0.1, 2.0, 64)
    alloc = allocate_samples(var, budget=64 * 6, max_extra=8)
    assert (alloc <= 8).all()
    assert alloc.sum() == 64 * 6  # capacity 64*8 > budget => fully spent


def test_no_extra_equals_uniform(scene):
    xs, ys = _grid()
    c, n = render_adaptive(TESTING, scene, xs, ys, 4, 4, tile_pixels=len(xs))
    u = render_pixels(TESTING, scene, xs, ys, spp=4, tile_pixels=len(xs))
    # allclose, not equal: the stats kernel is a different compiled program
    # than the plain scan (CLAUDE.md chaotic-lane allowance)
    np.testing.assert_allclose(c, u, rtol=1e-5, atol=1e-6)
    assert (n == 4).all()


def test_alloc_override_bit_exact(scene):
    """Forcing every pixel's extra count makes adaptive == uniform over the
    identical sample range, bit-for-bit (the merge path is pure addition)."""
    xs, ys = _grid()
    alloc = np.full(len(xs), 4, np.int32)
    c, n = render_adaptive(
        TESTING, scene, xs, ys, 4, 8, tile_pixels=len(xs), alloc=alloc
    )
    u = render_pixels(TESTING, scene, xs, ys, spp=8, tile_pixels=len(xs))
    assert (n == 8).all()
    # same sample set; only float summation order differs between the
    # two-pass accumulation and the single 8-sample scan
    np.testing.assert_allclose(c, u, rtol=1e-5, atol=1e-6)


def test_wavefront_stats_pass_matches_scan(scene):
    """Pass 1 via the wavefront kernel (with_stats=True) agrees with the
    scan kernel per lane, up to the documented chaotic-boundary allowance."""
    import jax.numpy as jnp

    from pathtracing_tpu.adaptive import (
        _render_tile_stats,
        _render_tile_stats_wavefront,
    )

    n = 1024
    idx = np.arange(n, dtype=np.int32)
    xs, ys = jnp.asarray(idx % 640), jnp.asarray((idx * 7) % 360)
    a = _render_tile_stats(TESTING, scene, xs, ys, 4)
    b = _render_tile_stats_wavefront(TESTING, scene, xs, ys, 4)
    for p, q in zip(a, b):
        close = np.isclose(np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.97


def test_equal_budget_lower_error(scene):
    """At the same total sample budget, variance-guided allocation beats
    uniform against a higher-spp reference. Deterministic comparison."""
    xs, ys = _grid()
    # reference from a DISJOINT sample range (base 64): sharing sample
    # indices with the compared renders would correlate the errors
    ref = render_pixels(
        TESTING, scene, xs, ys, spp=24, sample_base=64, tile_pixels=len(xs)
    )
    ca, na = render_adaptive(TESTING, scene, xs, ys, 4, 8, tile_pixels=len(xs))
    u8 = render_pixels(TESTING, scene, xs, ys, spp=8, tile_pixels=len(xs))
    assert na.sum() <= 8 * len(xs)

    def mse(a):
        return float(np.mean((np.clip(a, 0, 10) - np.clip(ref, 0, 10)) ** 2))

    m_adaptive, m_uniform = mse(ca), mse(u8)
    assert m_adaptive < m_uniform, (m_adaptive, m_uniform)
