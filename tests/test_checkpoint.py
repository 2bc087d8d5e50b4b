"""Sample-range checkpointing: partial accumulations must sum to the full
render bit-for-bit (seed depends only on (x,y,sample_index),
reference: path_tracer.hh:659)."""

import dataclasses

import numpy as np
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.render import render_pixels
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden
from golden_scene import scene_device_from_golden

CFG = dataclasses.replace(TESTING, max_bounces=2)


@pytest.fixture(scope="module")
def scene():
    return scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )


def test_sample_ranges_are_additive(scene):
    xs = np.array([300, 340, 400, 440], np.int32)
    ys = np.array([170, 190, 180, 200], np.int32)
    n = len(xs)
    full = render_pixels(
        CFG, scene, xs, ys, spp=4, tile_pixels=n, average=False
    )
    p0 = render_pixels(
        CFG, scene, xs, ys, spp=2, sample_base=0, tile_pixels=n, average=False
    )
    p1 = render_pixels(
        CFG, scene, xs, ys, spp=2, sample_base=2, tile_pixels=n, average=False
    )
    np.testing.assert_allclose(p0 + p1, full, rtol=1e-6, atol=1e-7)
    assert (np.abs(p1 - p0) > 0).any()  # different samples, different noise


def test_cli_merge_roundtrip(tmp_path, scene):
    # simulate two partial runs + merge without the full-scene loader
    import argparse

    from pathtracing_tpu.cli import merge_partials
    from pathtracing_tpu.io.bmp import read_bmp

    H, W = 4, 6
    rng = np.random.default_rng(0)
    sums_a = rng.random((H, W, 3), np.float32)
    sums_b = rng.random((H, W, 3), np.float32)
    np.savez_compressed(tmp_path / "frame_0000.part_0_2.npz", sums=sums_a, sample_range=(0, 2))
    np.savez_compressed(tmp_path / "frame_0000.part_2_4.npz", sums=sums_b, sample_range=(2, 4))
    args = argparse.Namespace(out=str(tmp_path))
    assert merge_partials(args) == 0
    img = read_bmp(str(tmp_path / "frame_0000.bmp"))
    assert img.shape == (H, W, 3)
