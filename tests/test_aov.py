"""AOV buffers (pathtracing_tpu/aov.py) — framework extension, no reference
equivalent. Pins: camera alignment with the beauty pass (same RNG stream),
channel semantics, and tiling invariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.aov import aov_samples, render_aovs
from pathtracing_tpu.ops.integrator import camera_sample, trace_ray, light_from_table
from pathtracing_tpu.ops import rng

from golden_scene import scene_device_from_golden
from pathtracing_tpu.utils.goldenio import load_golden


@pytest.fixture(scope="module")
def scene(golden_dir):
    return scene_device_from_golden(load_golden(str(golden_dir / "scene.gold")))


def _grid(w=40, h=24, stride=16):
    idx = np.arange(w * h, dtype=np.int32)
    return (idx % w) * stride, (idx // w) * (360 // h)


def test_aov_channels(scene):
    xs, ys = _grid()
    a = render_aovs(TESTING, scene, xs, ys, spp=4, tile_pixels=len(xs))
    assert set(a) == {"albedo", "normal", "depth", "coverage"}
    for v in a.values():
        assert np.isfinite(v).all()
    assert (a["coverage"] >= 0).all() and (a["coverage"] <= 1).all()
    # the golden scene has both sky and geometry in view
    assert 0.2 < a["coverage"].mean() < 0.95
    # normals are unit where anything hit, zero where nothing did
    n = np.linalg.norm(a["normal"], axis=-1)
    hit = a["coverage"] > 0
    assert np.allclose(n[hit], 1.0, atol=1e-3)
    assert (n[~hit] == 0).all()
    assert (a["depth"][~hit] == 0).all()
    assert (a["depth"][hit] > 0).all()
    # miss pixels have zero albedo
    assert (a["albedo"][~hit] == 0).all()


def test_aov_camera_matches_integrator(scene):
    """The AOV primary ray is the SAME ray the integrator traces: depth of a
    single sample equals the integrator's primary thit."""
    xs = jnp.asarray(np.arange(0, 640, 7, dtype=np.int32))
    ys = jnp.asarray(np.arange(0, 640, 7, dtype=np.int32) % 360)
    si = jnp.zeros(xs.shape, jnp.int32)

    _, _, depth, hit = aov_samples(TESTING, scene, xs, ys, si)

    _, _, light, tc, to, ray_o, ray_dir = camera_sample(
        TESTING, scene, xs, ys, si
    )
    info = trace_ray(
        scene, light, tc, to, ray_o, ray_dir, 0.0,
        jnp.ones(xs.shape, bool),
    )
    np.testing.assert_array_equal(
        np.asarray(depth), np.where(np.asarray(info.thit) > 0,
                                    np.asarray(info.thit), 0.0)
    )
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(info.thit) > 0)


def test_aov_tiling_invariance(scene):
    xs, ys = _grid()
    a1 = render_aovs(TESTING, scene, xs, ys, spp=2, tile_pixels=len(xs))
    a2 = render_aovs(TESTING, scene, xs, ys, spp=2, tile_pixels=256)
    for k in a1:
        np.testing.assert_allclose(a1[k], a2[k], rtol=0, atol=1e-6)


def test_camera_sample_preserves_rng_stream(scene):
    """camera_sample consumes exactly two pcg4d advances (warm-up + film
    draw) — the contract path_trace_samples' goldens depend on."""
    xs = jnp.asarray([3, 100], jnp.int32)
    ys = jnp.asarray([5, 200], jnp.int32)
    si = jnp.asarray([0, 9], jnp.int32)
    seed_out, *_ = camera_sample(TESTING, scene, xs, ys, si)

    s = rng.Seed(
        xs.astype(jnp.uint32), ys.astype(jnp.uint32),
        si.astype(jnp.uint32),
        jnp.full_like(xs, TESTING.student_id).astype(jnp.uint32),
    )
    s = rng.pcg4d(s)
    s, _ = rng.uniform4(s)
    for a, b in zip(seed_out, s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aov_wide_tables_match_binary(golden_dir):
    """AOVs ride the fast path when wide tables exist (ray_query
    auto-dispatches to the wide walk) and match the binary walk exactly —
    the VERDICT r3 ask that AOV primaries not bypass the fast path."""
    s_bin = scene_device_from_golden(load_golden(str(golden_dir / "scene.gold")))
    s_wide = scene_device_from_golden(
        load_golden(str(golden_dir / "scene.gold")), wide=True
    )
    assert getattr(s_wide, "wide_rows", None) is not None
    xs, ys = _grid()
    a = render_aovs(TESTING, s_bin, xs, ys, spp=2, tile_pixels=len(xs))
    b = render_aovs(TESTING, s_wide, xs, ys, spp=2, tile_pixels=len(xs))
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )
