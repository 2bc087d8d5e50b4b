#!/usr/bin/env python3
"""PSNR the production frame: our BMP vs the reference production gold.

    python tools/prod_compare.py [--gold build/prod/ref_prod_0000.gold]
                                 [--bmp build/prod/own/frame_0000.bmp]

Reports full-resolution PSNR and the course validator's half-res PSNR
(validator.py:43-52 protocol), against the 32 dB gate.
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gold", default="build/prod/ref_prod_0000.gold")
    ap.add_argument("--bmp", default="build/prod/own/frame_0000.bmp")
    args = ap.parse_args()

    from PIL import Image

    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.validate import RESIZE_FACTOR, downscale_local_mean

    g = load_golden(args.gold)
    ref = np.asarray(g["image_bgra"])[..., [2, 1, 0]].astype(np.float64)
    own = np.asarray(Image.open(args.bmp).convert("RGB")).astype(np.float64)
    assert ref.shape == own.shape, (ref.shape, own.shape)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return float("inf") if mse == 0 else 10 * np.log10(255 * 255 / mse)

    full = psnr(ref, own)
    half = psnr(
        downscale_local_mean(ref, RESIZE_FACTOR),
        downscale_local_mean(own, RESIZE_FACTOR),
    )
    print(f"production frame {args.bmp} vs {args.gold}")
    print(f"  full-res PSNR: {full:.2f} dB")
    print(f"  validator half-res PSNR: {half:.2f} dB "
          f"({'GOOD' if half >= 32 else 'BAD'}, gate 32)")


if __name__ == "__main__":
    main()
