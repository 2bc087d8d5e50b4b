"""Integrator vs the C++ oracle: per-sample radiance, tonemap bytes, and a
subsampled-image comparison against the 8spp oracle render."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.ops.tonemap import tonemap
from pathtracing_tpu.render import render_pixels
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from conftest import require_golden
from golden_scene import scene_device_from_golden


@pytest.fixture(scope="module")
def scene():
    return scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )


def test_per_sample_radiance(scene):
    tg = load_golden(str(require_golden("trace.gold")))
    keys = tg["keys"]
    fn = jax.jit(functools.partial(path_trace_samples, TESTING, scene))
    out = fn(
        jnp.asarray(keys[:, 0].astype(np.int32)),
        jnp.asarray(keys[:, 1].astype(np.int32)),
        jnp.asarray(keys[:, 2].astype(np.int32)),
    )
    got = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
    ref = tg["radiance"]
    # Almost all samples match to transcendental-ulp level. A tiny fraction
    # (~0.2%) legitimately diverge: FMA contraction inside the compiled
    # traversal shifts hit t by a few ulps, which at grazing secondary rays
    # flips a hit/miss decision (verified path-by-path against the oracle's
    # debug mode). Those paths are unbiased noise and vanish in the average.
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.quantile(rel, 0.995) < 5e-4, np.quantile(rel, 0.995)
    assert np.median(rel) < 1e-5


def test_tonemap_bytes(scene):
    tg = load_golden(str(require_golden("trace.gold")))
    tin = tg["tonemap_in"]
    ref = tg["tonemap_out"]
    b, g, r, a = jax.jit(tonemap)(
        Vec3(
            jnp.asarray(tin[:, 0]), jnp.asarray(tin[:, 1]), jnp.asarray(tin[:, 2])
        )
    )
    got = np.stack([np.asarray(b), np.asarray(g), np.asarray(r), np.asarray(a)], -1)
    # allow 1 LSB for pow() rounding differences
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_subsampled_image_vs_oracle(scene):
    rg = load_golden(str(require_golden("render8.gold")))
    ref_colors = rg["colors"]  # (H, W, 3) averaged over 8 spp
    H, W = ref_colors.shape[:2]
    step = 8
    ys_g, xs_g = np.mgrid[0:H:step, 0:W:step]
    xs = xs_g.reshape(-1).astype(np.int32)
    ys = ys_g.reshape(-1).astype(np.int32)
    got = render_pixels(TESTING, scene, xs, ys, spp=8, tile_pixels=len(xs))
    ref = ref_colors[ys, xs]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    # bulk of pixels bit-tight; rare grazing-path divergence tolerated
    assert np.quantile(rel, 0.98) < 1e-3, np.quantile(rel, 0.98)

    # image-level gate, validator-style (reference: validator.py:50): PSNR on
    # tonemapped pixels, same spp and same RNG => far above the 32 dB bar.
    def tm(c):
        v = Vec3(*(jnp.asarray(c[:, i]) for i in range(3)))
        b, g, r, a = tonemap(v)
        return np.stack([np.asarray(b), np.asarray(g), np.asarray(r)], -1).astype(np.float64)

    mse = ((tm(got) - tm(ref)) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    # 37.2 dB measured at 8 spp; the validator bar is 32 dB and the rare
    # divergent samples dilute ~linearly with spp (256 spp in production).
    assert psnr > 35.0, psnr


def test_production_config_compiles(scene):
    """PRODUCTION preset (5 bounces, 128 subframes) on a tiny batch."""
    import dataclasses

    from pathtracing_tpu.config import PRODUCTION

    cfg = dataclasses.replace(PRODUCTION, image_width=640, image_height=360)
    # golden scene has 32 subframe rows; sample_index < 256 keeps in range
    fn = jax.jit(functools.partial(path_trace_samples, cfg, scene))
    out = fn(
        jnp.asarray([100, 200], jnp.int32),
        jnp.asarray([100, 200], jnp.int32),
        jnp.asarray([0, 255], jnp.int32),
    )
    assert np.isfinite(np.asarray(out.x)).all()


def test_negative_sample_index_uses_subframe0(scene):
    """sample_index < 0 => subframe 0 (reference: path_tracer.hh:655-657)."""
    fn = jax.jit(functools.partial(path_trace_samples, TESTING, scene))
    neg = fn(
        jnp.asarray([320], jnp.int32),
        jnp.asarray([180], jnp.int32),
        jnp.asarray([-1], jnp.int32),
    )
    assert np.isfinite(np.asarray(neg.x)).all()


def test_motion_blur_subframes_match_oracle():
    """Distinct subframes (moving teapot, moving sun): per-sample radiance
    across sample_index 0..31 gathers the right subframe per ray
    (reference: path_tracer.hh:655-657, scene.cc:648-717)."""
    from golden_scene import scene_device_from_motion_golden

    from conftest import require_golden

    g = load_golden(str(require_golden("motion.gold")))
    mscene = scene_device_from_motion_golden(g)
    keys = g["keys"]
    fn = jax.jit(functools.partial(path_trace_samples, TESTING, mscene))
    out = fn(
        jnp.asarray(keys[:, 0].astype(np.int32)),
        jnp.asarray(keys[:, 1].astype(np.int32)),
        jnp.asarray(keys[:, 2].astype(np.int32)),
    )
    got = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
    ref = g["radiance"]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.quantile(rel, 0.995) < 5e-4, np.quantile(rel, 0.995)
    assert np.median(rel) < 1e-5


def test_bokeh_aperture_matches_oracle(scene):
    """Thin-lens aperture path: sample_regular_polygon + focal plane
    (reference: path_tracer.hh:50-62, 434-450)."""
    tg = load_golden(str(require_golden("trace.gold")))
    if "bokeh_keys" not in tg:
        pytest.skip("bokeh goldens not generated")
    cam = np.asarray(scene.sf_cam).copy()
    cam[:, 17] = 0.3          # aperture_radius
    cam[:, 14] = 10.0         # focal_distance
    cam[:, 15] = np.float32(np.pi / 7)  # aperture_angle
    bscene = scene._replace(sf_cam=jnp.asarray(cam))
    keys = tg["bokeh_keys"]
    fn = jax.jit(functools.partial(path_trace_samples, TESTING, bscene))
    out = fn(
        jnp.asarray(keys[:, 0].astype(np.int32)),
        jnp.asarray(keys[:, 1].astype(np.int32)),
        jnp.asarray(keys[:, 2].astype(np.int32)),
    )
    got = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
    ref = tg["bokeh_radiance"]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.quantile(rel, 0.995) < 5e-4, np.quantile(rel, 0.995)
    assert np.median(rel) < 1e-5
