"""Emissive-surface NEE (ops/arealights.py).

The feature is opt-in (pack_scene(..., emissive_nee=True)); the default RNG
stream and radiance stay bit-faithful — every golden test in the suite
pins that. These tests pin the opt-in estimator itself: the host light
table, unbiasedness (means agree with the BSDF-only estimator where both
converge), and the variance win it exists for.
"""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.render import render_pixels
from pathtracing_tpu.scene.builder import SceneBuilder

CFG = TESTING


def _write_panel_scene(tmp, kd="3 3 3", ke="3 3 3"):
    with open(os.path.join(tmp, "g.obj"), "w") as f:
        f.write(
            "mtllib m.mtl\nusemtl g\nv -20 0 -20\nv 20 0 -20\nv 20 0 20\n"
            "v -20 0 20\nvn 0 1 0\nf 1//1 2//1 3//1\nf 1//1 3//1 4//1\n"
        )
    with open(os.path.join(tmp, "p.obj"), "w") as f:
        f.write(
            "mtllib m.mtl\nusemtl light\nv -4 6 -4\nv 4 6 -4\nv 4 6 4\n"
            "v -4 6 4\nvn 0 -1 0\nf 1//1 3//1 2//1\nf 1//1 4//1 3//1\n"
        )
    with open(os.path.join(tmp, "m.mtl"), "w") as f:
        f.write(f"newmtl g\nKd 0.6 0.6 0.6\nPr 0.8\nnewmtl light\nKd {kd}\nKe {ke}\nPr 1.0\n")


def _build_panel(nee: bool, scale=(1, 1, 1), two_panels=False):
    tmp = tempfile.mkdtemp(prefix="arealight_")
    _write_panel_scene(tmp)
    b = SceneBuilder()
    b.add_mesh("g", os.path.join(tmp, "g.obj"))
    b.add_mesh("p", os.path.join(tmp, "p.obj"))
    b.add_instance("g")
    b.add_instance("p", scale=scale)
    if two_panels:
        b.add_instance("p", pos=(30, 0, 0))
    b.set_camera(position=(0, 2.0, 12.0), pitch_yaw_roll=(8, 0, 0), fov=50)
    b.set_light(direction=(0, 1, 0), color=(0, 0, 0))  # no sun
    return b.build(CFG, emissive_nee=nee)


def test_light_table_layout():
    """lt_* table contents: world-space verts, per-instance segments,
    per-mesh ranks, area CDF — including two instances of one emissive
    mesh with different transforms (distinct world rows, shared ranks)."""
    scene, dev = _build_panel(True, scale=(2, 1, 1), two_panels=True)
    assert dev.lt_tris is not None
    lt_tris = np.asarray(dev.lt_tris)
    lt_cdf = np.asarray(dev.lt_cdf)
    lt_seg = np.asarray(dev.lt_seg)
    lt_rank = np.asarray(dev.lt_rank)
    lt_rows = np.asarray(dev.lt_rows)

    # panel mesh = 2 emissive triangles; two instances => 4 rows
    assert lt_tris.shape == (4, 9)
    assert lt_seg[0] == -1 and lt_seg[1] == 0 and lt_seg[2] == 2
    # ranks live on the mesh's global tri rows (both instances share them)
    assert (lt_rank >= 0).sum() == 2
    # scaled instance (x2 in x): each panel triangle is 8x8/2=32 scaled to 64
    areas = np.diff(np.concatenate([[0.0], lt_cdf]))
    np.testing.assert_allclose(areas, [64.0, 64.0, 32.0, 32.0], rtol=1e-5)
    # world verts of instance 2 are translated by +30 in x
    np.testing.assert_allclose(
        lt_tris[2][0::3], lt_tris[0][0::3] / 2 + 30, rtol=1e-5
    )
    # lt_rows index the global tri table of the panel mesh for both
    assert list(lt_rows[:2]) == list(lt_rows[2:])


def test_unbiased_vs_bsdf_only():
    """On a large emitter both estimators converge fast; their means must
    agree (one-sample power-heuristic MIS weights sum to 1 per path)."""
    rng = np.random.default_rng(5)
    n = 192
    xs = jnp.asarray(rng.integers(0, CFG.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, CFG.image_height, n), jnp.int32)
    spp = 160
    a = np.asarray(render_pixels(CFG, _build_panel(True)[1], xs, ys, spp=spp))
    b = np.asarray(render_pixels(CFG, _build_panel(False)[1], xs, ys, spp=spp))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    rel = abs(a.mean() - b.mean()) / b.mean()
    assert rel < 0.02, rel
    # per-pixel agreement too (no spatially-localized bias)
    pp = np.abs(a - b).mean() / b.mean()
    assert pp < 0.05, pp


def test_cornell_variance_reduction():
    """The point of the feature: at equal spp, light sampling beats the
    reference-style BSDF-only estimator on a small bright emitter."""
    from pathtracing_tpu import models

    rng = np.random.default_rng(3)
    n = 256
    xs = jnp.asarray(rng.integers(0, CFG.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, CFG.image_height, n), jnp.int32)
    _, dev_nee = models.build("cornell_box", CFG)
    _, dev_ref = models.build("cornell_box", CFG, emissive_nee=False)
    truth = np.asarray(render_pixels(CFG, dev_nee, xs, ys, spp=256))
    a = np.asarray(render_pixels(CFG, dev_nee, xs, ys, spp=16, sample_base=1000))
    b = np.asarray(render_pixels(CFG, dev_ref, xs, ys, spp=16, sample_base=1000))
    mse_a = float(((a - truth) ** 2).mean())
    mse_b = float(((b - truth) ** 2).mean())
    assert mse_a < mse_b / 1.4, (mse_a, mse_b)


def test_wavefront_matches_scan_with_lights():
    """The wavefront renderer implements the identical light-sampling draw
    order: per-pixel sums match the scan integrator to fusion ulps (same
    gate as tests/test_wavefront.py)."""
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.ops.wavefront import path_trace_wavefront

    _, dev = _build_panel(True)
    rng = np.random.default_rng(7)
    n = 256
    xs = jnp.asarray(rng.integers(0, CFG.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, CFG.image_height, n), jnp.int32)
    spp = 4

    acc = [jnp.zeros(n, jnp.float32) for _ in range(3)]
    for j in range(spp):
        si = jnp.full(n, j, jnp.int32)
        c = path_trace_samples(CFG, dev, xs, ys, si)
        acc = [acc[0] + c.x, acc[1] + c.y, acc[2] + c.z]
    ref = np.stack([np.asarray(a) for a in acc], -1)

    wf = path_trace_wavefront(CFG, dev, xs, ys, spp)
    got = np.stack([np.asarray(wf.x), np.asarray(wf.y), np.asarray(wf.z)], -1)

    finite = np.isfinite(ref).all(-1)
    assert finite.mean() > 0.99
    close = (
        np.abs(got[finite] - ref[finite]) <= 2e-4 + 2e-4 * np.abs(ref[finite])
    ).all(-1)
    assert close.mean() > 0.97, close.mean()


def test_megakernel_matches_scan_with_lights():
    """The persistent-lane megakernel chains the area shadow as an extra
    phase (shade -> sun shadow -> area shadow -> bounce); per-pixel sums
    must match the scan integrator to the same fusion-ulp gate."""
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    from pathtracing_tpu.render import megakernel_supported

    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="arealight_mk_")
    _write_panel_scene(tmp)
    from pathtracing_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_mesh("g", os.path.join(tmp, "g.obj"))
    b.add_mesh("p", os.path.join(tmp, "p.obj"))
    b.add_instance("g")
    b.add_instance("p")
    b.set_camera(position=(0, 2.0, 12.0), pitch_yaw_roll=(8, 0, 0), fov=50)
    b.set_light(direction=(0, 1, 0), color=(0, 0, 0))
    _, dev_wide = b.build(CFG, emissive_nee=True, wide=True)
    assert dev_wide.wide_rows is not None and dev_wide.lt_tris is not None

    n_pixels = 512  # pixels [0, 512) of row 0..1
    xs = jnp.arange(n_pixels, dtype=jnp.int32) % CFG.image_width
    ys = jnp.arange(n_pixels, dtype=jnp.int32) // CFG.image_width
    spp = 4

    acc = [jnp.zeros(n_pixels, jnp.float32) for _ in range(3)]
    for j in range(spp):
        si = jnp.full(n_pixels, j, jnp.int32)
        c = path_trace_samples(CFG, dev_wide, xs, ys, si)
        acc = [acc[0] + c.x, acc[1] + c.y, acc[2] + c.z]
    ref = np.stack([np.asarray(a) for a in acc], -1)

    mk = path_trace_megakernel(
        CFG, dev_wide, n_pixels, spp, 0, lanes=256, leaf_every=4
    )
    got = np.stack(
        [np.asarray(mk.x), np.asarray(mk.y), np.asarray(mk.z)], -1
    )[:n_pixels]

    assert megakernel_supported(
        dev_wide, np.asarray(xs), np.asarray(ys), CFG.image_width
    )
    finite = np.isfinite(ref).all(-1)
    assert finite.mean() > 0.99
    close = (
        np.abs(got[finite] - ref[finite]) <= 2e-4 + 2e-4 * np.abs(ref[finite])
    ).all(-1)
    assert close.mean() > 0.97, close.mean()
