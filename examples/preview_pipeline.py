#!/usr/bin/env python3
"""Fast-preview pipeline demo: adaptive sampling + AOVs + denoise.

Renders a window of the golden scene three ways and reports MSE against a
high-spp reference (all deterministic under the (x, y, sample_index) seed
contract):
  1. uniform low spp
  2. variance-guided adaptive at the same total budget (adaptive.py)
  3. adaptive + AOV-guided joint-bilateral denoise (aov.py, denoise.py)

    python examples/preview_pipeline.py [--spp 8] [--base 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

import numpy as np


def run(spp: int = 8, base: int = 4, quiet: bool = False):
    from pathtracing_tpu.utils.platform import ensure_backend

    ensure_backend()

    from golden_scene import scene_device_from_golden
    from pathtracing_tpu.adaptive import render_adaptive
    from pathtracing_tpu.aov import render_aovs
    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.denoise import joint_bilateral_denoise
    from pathtracing_tpu.render import render_pixels
    from pathtracing_tpu.utils.goldenio import load_golden

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = scene_device_from_golden(
        load_golden(os.path.join(repo, "tests", "golden", "scene.gold"))
    )

    W, H, X0, Y0 = 96, 54, 272, 140
    idx = np.arange(W * H, dtype=np.int32)
    xs, ys = X0 + idx % W, Y0 + idx // W

    ref = render_pixels(
        TESTING, scene, xs, ys, spp=32, sample_base=64, tile_pixels=W * H
    ).reshape(H, W, 3)

    def mse(a):
        return float(np.mean((np.clip(a, 0, 10) - np.clip(ref, 0, 10)) ** 2))

    from pathtracing_tpu.adaptive import render_with_variance

    uniform_lo, stderr = render_with_variance(
        TESTING, scene, xs, ys, spp=base, tile_pixels=W * H
    )
    uniform_lo = uniform_lo.reshape(H, W, 3)
    stderr = stderr.reshape(H, W)
    uniform = render_pixels(
        TESTING, scene, xs, ys, spp=spp, tile_pixels=W * H
    ).reshape(H, W, 3)

    adaptive, counts = render_adaptive(
        TESTING, scene, xs, ys, base, spp, tile_pixels=W * H
    )
    adaptive = adaptive.reshape(H, W, 3)

    aovs = render_aovs(TESTING, scene, xs, ys, spp=base, tile_pixels=W * H)
    aovs = {k: v.reshape(H, W, -1).squeeze() for k, v in aovs.items()}
    # denoising targets NOISY previews: on a near-converged image its
    # edge-stopping blur floor would dominate the residual noise
    denoised = joint_bilateral_denoise(uniform_lo, aovs, noise=stderr)

    results = {
        f"uniform {base} spp": mse(uniform_lo),
        f"uniform {base} spp + denoise": mse(denoised),
        f"uniform {spp} spp": mse(uniform),
        f"adaptive {base}->{spp} (mean {counts.mean():.1f} spp)": mse(adaptive),
    }
    if not quiet:
        for k, v in results.items():
            print(f"  {k:42s} MSE {v:.3e}")
    vals = list(results.values())
    assert vals[1] < vals[0], "denoise should reduce preview error"
    assert vals[3] < vals[2], "adaptive should beat uniform at equal budget"
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--base", type=int, default=4)
    args = ap.parse_args()
    run(args.spp, args.base)
