"""Validator CLI: downscale/PSNR semantics and pass/fail behavior
(reference: validator.py:10-70)."""

import numpy as np
import pytest

from pathtracing_tpu.io.bmp import write_bmp
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.validate import downscale_local_mean, main, psnr

from conftest import require_golden


def _write_pair(tmp_path, own_img, ref_img):
    from PIL import Image

    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "own").mkdir(exist_ok=True)
    Image.fromarray(ref_img).save(tmp_path / "ref" / "0000.png")
    bgra = np.dstack(
        [own_img[..., 2], own_img[..., 1], own_img[..., 0],
         np.full(own_img.shape[:2], 255, np.uint8)]
    )
    write_bmp(str(tmp_path / "own" / "frame_0000.bmp"), bgra)


def test_validator_pass_and_fail(tmp_path, monkeypatch):
    g = load_golden(str(require_golden("render8.gold")))
    own = g["image_bgra"][..., [2, 1, 0]]  # RGB
    ref = downscale_local_mean(own, 2).astype(np.uint8)

    monkeypatch.chdir(tmp_path)
    _write_pair(tmp_path, own, ref)
    assert main([str(tmp_path / "ref"), str(tmp_path / "own"), "--frames", "1"]) == 0
    assert "successful" in (tmp_path / "validation_result.txt").read_text()

    # corrupt the image => FAIL (reference: validator.py:50-52)
    corrupted = own.copy()
    corrupted[: own.shape[0] // 2] = 0
    _write_pair(tmp_path, corrupted, ref)
    assert main([str(tmp_path / "ref"), str(tmp_path / "own"), "--frames", "1"]) == 1
    assert "failure" in (tmp_path / "validation_result.txt").read_text()


def test_downscale_matches_skimage_semantics():
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    d = downscale_local_mean(img, 2)
    assert d.shape == (4, 4, 3)
    np.testing.assert_allclose(
        d[0, 0], img[0:2, 0:2].reshape(4, 3).mean(0)
    )


def test_psnr():
    a = np.zeros((4, 4, 3), np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 255
    expected = 10 * np.log10(255.0**2 / ((255.0**2) / 48))
    np.testing.assert_allclose(psnr(a, b), expected)
