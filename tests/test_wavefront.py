"""Wavefront-with-regeneration renderer vs the scan renderer.

Same seeds, same draw order, same per-sample math — sums must agree to
kernel-fusion ulps on the golden scene.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.ops.wavefront import path_trace_wavefront
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden
from golden_scene import scene_device_from_golden


def _scan_sums(scene, xs, ys, spp, base=0):
    acc = [jnp.zeros(xs.shape, jnp.float32) for _ in range(3)]
    for j in range(spp):
        si = jnp.full(xs.shape, base + j, jnp.int32)
        c = path_trace_samples(TESTING, scene, xs, ys, si)
        acc = [acc[0] + c.x, acc[1] + c.y, acc[2] + c.z]
    return np.stack([np.asarray(a) for a in acc], -1)


def test_wavefront_matches_scan():
    scene = scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )
    n = 512
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, TESTING.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, TESTING.image_height, n), jnp.int32)
    spp = 4

    ref = _scan_sums(scene, xs, ys, spp)
    acc = path_trace_wavefront(TESTING, scene, xs, ys, spp)
    got = np.stack([np.asarray(acc.x), np.asarray(acc.y), np.asarray(acc.z)], -1)

    finite = np.isfinite(ref).all(-1)
    assert finite.mean() > 0.99
    # A small fraction of samples sit on chaotic path boundaries: their
    # radiance flips with compilation ulps (the scan renderer itself returns
    # 0.366 eager vs 0.0 jitted for golden pixel (537,328) sample 1). Gate:
    # the stable lanes match tightly, flipped lanes are rare.
    close = (
        np.abs(got[finite] - ref[finite])
        <= 2e-4 + 2e-4 * np.abs(ref[finite])
    ).all(-1)
    assert close.mean() > 0.97, close.mean()


def test_wavefront_sample_base():
    """Sample-range partials must match the scan renderer's partials
    (checkpointing contract: ranges sum independently)."""
    scene = scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )
    n = 256
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.integers(0, TESTING.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, TESTING.image_height, n), jnp.int32)

    ref = _scan_sums(scene, xs, ys, 2, base=6)
    acc = path_trace_wavefront(TESTING, scene, xs, ys, 2, sample_base=6)
    got = np.stack([np.asarray(acc.x), np.asarray(acc.y), np.asarray(acc.z)], -1)
    finite = np.isfinite(ref).all(-1)
    close = (
        np.abs(got[finite] - ref[finite])
        <= 2e-4 + 2e-4 * np.abs(ref[finite])
    ).all(-1)
    assert close.mean() > 0.97, close.mean()
