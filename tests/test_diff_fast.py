"""Record/replay fast-path gradients (diff/render.make_fast_grad_fn).

The two-pass protocol must reproduce the slow path's fixed-topology
gradients exactly up to fp reassociation: pass 1 records the hit
topology with the fast (stop-gradient) traversal, pass 2 differentiates
a traversal-free replay. Compared here on the golden scene against
render_value_and_grad on the same lanes.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.diff.render import (
    make_fast_grad_fn,
    render_value_and_grad,
)
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden
from golden_scene import scene_device_from_golden

CFG = dataclasses.replace(TESTING, max_bounces=2)

XS = np.array([300, 320, 340, 360, 380, 400, 420, 440], np.int32)
YS = np.array([170, 180, 190, 160, 170, 180, 190, 200], np.int32)


@pytest.fixture(scope="module")
def scene():
    return scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )


@pytest.fixture(scope="module")
def scene_wide():
    return scene_device_from_golden(
        load_golden(str(require_golden("scene.gold"))), wide=True
    )


def test_record_replay_radiance_identical(scene):
    """The replay recomputes the exact same radiance as the direct path."""
    xs, ys = jnp.asarray(XS), jnp.asarray(YS)
    si = jnp.zeros(len(XS), jnp.int32)
    direct = path_trace_samples(CFG, scene, xs, ys, si)
    _, records = path_trace_samples(CFG, scene, xs, ys, si, record=True)
    replayed = path_trace_samples(CFG, scene, xs, ys, si, replay=records)
    for a, b in zip(direct, replayed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("wide", [False, True])
def test_fast_grads_match_slow(scene, scene_wide, wide):
    s = scene_wide if wide else scene
    xs, ys = jnp.asarray(XS), jnp.asarray(YS)
    si = jnp.zeros(len(XS), jnp.int32)
    loss_slow, g_slow = render_value_and_grad(CFG, s, xs, ys, si)
    loss_fast, g_fast = make_fast_grad_fn(CFG)(s, xs, ys, si)
    # the two paths build different XLA graphs (jit fusion reassociates
    # fp), so tolerances mirror the finite-difference gate's scale rather
    # than ulp equality; topology identity is pinned bit-exactly by
    # test_record_replay_radiance_identical
    np.testing.assert_allclose(
        float(loss_fast), float(loss_slow), rtol=1e-4
    )
    for k in g_slow:
        a, b = np.asarray(g_slow[k]), np.asarray(g_fast[k])
        scale = np.abs(a).max()
        np.testing.assert_allclose(
            b, a, rtol=2e-2, atol=2e-2 * scale + 1e-9, err_msg=k
        )
        assert abs(
            int((np.abs(a) > 1e-12).sum()) - int((np.abs(b) > 1e-12).sum())
        ) <= 2, f"{k}: gradient support changed"


def test_frame_fast_grads_match_slow(scene_wide):
    """Megakernel-record + scan-replay frame gradients equal the slow
    path on the same (pixel, sample) work items."""
    from pathtracing_tpu.diff.render import make_fast_grad_frame_fn

    n_pixels, spp = 2 * CFG.image_width, 2
    n_items = n_pixels * spp
    item = np.arange(n_items, dtype=np.int32)
    pix = item % n_pixels
    xs = jnp.asarray(pix % CFG.image_width)
    ys = jnp.asarray(pix // CFG.image_width)
    si = jnp.asarray(item // n_pixels)

    loss_slow, g_slow = render_value_and_grad(CFG, scene_wide, xs, ys, si)
    loss_fast, g_fast = make_fast_grad_frame_fn(
        CFG, n_pixels, spp, lanes=512
    )(scene_wide)
    np.testing.assert_allclose(
        float(loss_fast), float(loss_slow), rtol=1e-4
    )
    for k in g_slow:
        a, b = np.asarray(g_slow[k]), np.asarray(g_fast[k])
        scale = np.abs(a).max()
        np.testing.assert_allclose(
            b, a, rtol=2e-2, atol=2e-2 * scale + 1e-9, err_msg=k
        )
