"""Persistent-lane megakernel renderer vs the scan renderer.

Same seeds, same per-lane draw order, same per-sample math as the scan and
wavefront renderers — sums must agree to kernel-fusion ulps on the golden
scene (the same chaotic-lane budget as tests/test_wavefront.py).
"""

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.ops.megakernel import path_trace_megakernel
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


def _compare(scene_bin, scene_wide, n_pixels, lanes, spp, base=0,
             leaf_every=4):
    idx = np.arange(n_pixels, dtype=np.int32)
    xs = jnp.asarray(idx % TESTING.image_width)
    ys = jnp.asarray(idx // TESTING.image_width)
    ref = _scan_sums(scene_bin, xs, ys, spp, base)
    acc = path_trace_megakernel(
        TESTING, scene_wide, n_pixels, spp, base, lanes=lanes,
        leaf_every=leaf_every,
    )
    got = np.stack(
        [np.asarray(acc.x), np.asarray(acc.y), np.asarray(acc.z)], -1
    )[:n_pixels]
    finite = np.isfinite(ref).all(-1)
    assert finite.mean() > 0.99
    close = (
        np.abs(got[finite] - ref[finite])
        <= 2e-4 + 2e-4 * np.abs(ref[finite])
    ).all(-1)
    assert close.mean() > 0.97, close.mean()


def test_megakernel_matches_scan():
    g = load_golden(str(require_golden("scene.gold")))
    scene_bin = scene_device_from_golden(g)
    scene_wide = scene_device_from_golden(g, wide=True)
    _compare(scene_bin, scene_wide, n_pixels=1000, lanes=256, spp=4)


def test_megakernel_sample_base_and_period():
    g = load_golden(str(require_golden("scene.gold")))
    scene_bin = scene_device_from_golden(g)
    scene_wide = scene_device_from_golden(g, wide=True)
    _compare(scene_bin, scene_wide, n_pixels=512, lanes=128, spp=2, base=5,
             leaf_every=2)
    _compare(scene_bin, scene_wide, n_pixels=512, lanes=128, spp=2, base=5,
             leaf_every=6)


def test_megakernel_spp_chunking(monkeypatch):
    """render_pixels chunks the sample range when the accumulator planes
    would blow the memory budget (the production-config path: 1920x1080 @
    1024 spp is ~25 GB unchunked). Chunked partial sums must reproduce the
    single-dispatch result (sample-range seeding contract)."""
    from pathtracing_tpu.render import render_pixels

    g = load_golden(str(require_golden("scene.gold")))
    scene_wide = scene_device_from_golden(g, wide=True)
    W = TESTING.image_width
    n = 2 * W
    xs = np.arange(n, dtype=np.int32) % W
    ys = np.arange(n, dtype=np.int32) // W

    whole = render_pixels(TESTING, scene_wide, xs, ys, spp=4, megakernel=True)
    # budget of ~1 item-plane forces spp chunks of 1
    monkeypatch.setenv("PT_MK_ACC_MB", "0")
    from pathtracing_tpu.render import _mk_spp_chunk

    assert _mk_spp_chunk(n, 4) == 1
    chunked = render_pixels(
        TESTING, scene_wide, xs, ys, spp=4, megakernel=True
    )
    np.testing.assert_allclose(chunked, whole, rtol=1e-6, atol=1e-7)


def test_megakernel_knob_invariance():
    """Scheduling knobs (lanes / leaf_every / service_div) must not change
    per-sample semantics: at spp=1 the per-pixel output IS one sample's
    radiance (no fold-order ambiguity), so every knob combination must
    agree to compiled-fusion ulps — each knob value is a different XLA
    program, so a handful of elements drift by ~1e-7 (measured 4.6% of
    lanes at <=7e-7 relative), but EVERY element must stay inside a tight
    1e-5 gate and >80% must be bit-exact. A semantics bug (draw-order or
    traversal drift) moves whole radiance terms, not ulps, and fails this
    where the 2e-4/97% scan-comparison budget could hide it (r2 VERDICT
    weak #7)."""
    g = load_golden(str(require_golden("scene.gold")))
    scene_wide = scene_device_from_golden(g, wide=True)
    n_pixels = 1000
    base = path_trace_megakernel(
        TESTING, scene_wide, n_pixels, 1, 0, lanes=256, leaf_every=4
    )
    ref = np.stack([np.asarray(base.x), np.asarray(base.y),
                    np.asarray(base.z)], -1)
    for lanes, leaf, sdiv in ((512, 4, 8), (256, 2, 8), (256, 6, 2),
                              (1024, 4, 1)):
        acc = path_trace_megakernel(
            TESTING, scene_wide, n_pixels, 1, 0, lanes=lanes,
            leaf_every=leaf, service_div=sdiv,
        )
        got = np.stack([np.asarray(acc.x), np.asarray(acc.y),
                        np.asarray(acc.z)], -1)
        label = f"lanes={lanes} leaf={leaf} sdiv={sdiv}"
        np.testing.assert_allclose(
            got, ref, rtol=1e-5, atol=1e-6, err_msg=label
        )
        exact = (got == ref).mean()
        assert exact > 0.8, f"{label}: only {exact:.1%} bit-exact"
