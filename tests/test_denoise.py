"""AOV-guided joint-bilateral denoiser (pathtracing_tpu/denoise.py).

Deterministic: sample values are keyed by (x, y, sample_index), so the
noisy/reference image pair is fixed and the MSE comparison is exact.
"""

import numpy as np
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.aov import render_aovs
from pathtracing_tpu.denoise import joint_bilateral_denoise
from pathtracing_tpu.render import render_pixels

from golden_scene import scene_device_from_golden
from pathtracing_tpu.utils.goldenio import load_golden


@pytest.fixture(scope="module")
def scene(golden_dir):
    return scene_device_from_golden(load_golden(str(golden_dir / "scene.gold")))


W, H = 64, 36
X0, Y0 = 288, 150  # a contiguous window over geometry in the golden frame


def _frame(scene, spp, sample_base=0):
    idx = np.arange(W * H, dtype=np.int32)
    xs, ys = X0 + idx % W, Y0 + idx // W
    return render_pixels(
        TESTING, scene, xs, ys, spp=spp, tile_pixels=W * H,
        sample_base=sample_base,
    ).reshape(H, W, 3), xs, ys


def test_denoise_reduces_error(scene):
    from pathtracing_tpu.adaptive import render_with_variance

    idx = np.arange(W * H, dtype=np.int32)
    xs, ys = X0 + idx % W, Y0 + idx // W
    noisy, stderr = render_with_variance(
        TESTING, scene, xs, ys, spp=2, tile_pixels=W * H
    )
    noisy = noisy.reshape(H, W, 3)
    # disjoint sample range so reference noise is independent of the input
    ref, _, _ = _frame(scene, 32, sample_base=64)
    aovs = render_aovs(TESTING, scene, xs, ys, spp=2, tile_pixels=W * H)
    aovs = {k: v.reshape(H, W, -1).squeeze() for k, v in aovs.items()}

    clip = lambda a: np.clip(a, 0, 10)
    mse = lambda a: float(np.mean((clip(a) - clip(ref)) ** 2))
    mse_noisy = mse(noisy)

    out = joint_bilateral_denoise(noisy, aovs)
    assert out.shape == noisy.shape and np.isfinite(out).all()
    assert mse(out) < mse_noisy, (mse(out), mse_noisy)

    # the noise-scaled range kernel also improves, while bounding the blur
    # of illumination edges the guides cannot see
    ranged = joint_bilateral_denoise(
        noisy, aovs, noise=stderr.reshape(H, W)
    )
    assert mse(ranged) < mse_noisy, (mse(ranged), mse_noisy)


def test_denoise_preserves_flat_regions(scene):
    """A constant image with uniform guides passes through unchanged."""
    colors = np.full((H, W, 3), 0.25, np.float32)
    aovs = {
        "albedo": np.full((H, W, 3), 0.5, np.float32),
        "normal": np.tile(np.array([0, 0, 1], np.float32), (H, W, 1)),
        "depth": np.full((H, W), 3.0, np.float32),
        "coverage": np.ones((H, W), np.float32),
    }
    out = joint_bilateral_denoise(colors, aovs)
    np.testing.assert_allclose(out, colors, rtol=1e-5, atol=1e-6)
