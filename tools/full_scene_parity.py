#!/usr/bin/env python3
"""Full-animation parity: this framework vs the REFERENCE'S OWN binary.

The reference's load_scene()/setup_animation_frame()/path_trace_pixel are
compiled unmodified (tools/oracle/harness.cc `animframe`, linked against
/root/reference/scene.cc) and pointed at an asset dir that combines the
real data/*.obj with the deterministic procedural substitutes for the three
stripped blobs (terrain/bunny/pine_tree — scene/assets.py). Both renderers
then draw the SAME animation frames with the SAME RNG seeds, so the images
must agree almost pixel-for-pixel (the gate is PSNR because the two float
pipelines legitimately differ in rounding; the reference's own validator
bar is 32 dB at half resolution, validator.py:10-12).

    python tools/full_scene_parity.py [--frames 0 450 900] [--spp 8]

Exercises end-to-end: OBJ/MTL load, terrain recolor, seeded placement ray
casts, the whole animation table, per-subframe TLAS builds, camera, sunset
sun, integrator, tonemap.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("REFERENCE_DIR", "/root/reference")
WORK = os.path.join(REPO, "build", "parity")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def prepare_assets() -> str:
    """data/ dir = real reference assets + generated substitutes."""
    from pathtracing_tpu.scene.assets import ensure_substitutes

    data = os.path.join(WORK, "data")
    os.makedirs(data, exist_ok=True)
    for name in os.listdir(os.path.join(REF, "data")):
        src = os.path.join(REF, "data", name)
        dst = os.path.join(data, name)
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    gen = ensure_substitutes(os.path.join(REPO, "assets", "generated"))
    for stem, path in gen.items():
        for ext in (".obj", ".mtl"):
            src = os.path.splitext(path)[0] + ext
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(data, stem + ext))
    return data


def build_harness() -> str:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_goldens.py"),
         "--skip-render"],
        check=True, capture_output=True,
    )
    return os.path.join(REPO, "build", "oracle", "harness")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[0, 450, 900, 1350])
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--min-psnr", type=float, default=32.0)
    ap.add_argument("--cpu", action="store_true", help="skip the TPU probe")
    args = ap.parse_args()

    harness = build_harness()
    prepare_assets()

    from pathtracing_tpu.utils.goldenio import load_golden

    # --- reference side (its own scene.cc + path_tracer.hh) ---
    ref_imgs = {}
    for f in args.frames:
        out = os.path.join(WORK, f"ref_frame_{f:04d}.gold")
        t0 = time.perf_counter()
        subprocess.run(
            [harness, "animframe", WORK, str(f), str(args.spp), out],
            check=True,
        )
        g = load_golden(out)
        ref_imgs[f] = np.asarray(g["image_bgra"])
        print(f"reference frame {f}: {time.perf_counter()-t0:.1f}s")

    # --- this framework (same data dir, same config) ---
    # Probe the TPU in a subprocess first: merely initializing a wedged axon
    # tunnel sleep-polls forever (see CLAUDE.md), so never touch backends
    # before deciding.
    try:
        tpu_ok = not args.cpu and (
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "jnp.arange(4.0).sum().block_until_ready()"],
                timeout=120, capture_output=True,
            ).returncode == 0
        )
    except subprocess.TimeoutExpired:
        tpu_ok = False
    import jax

    if not tpu_ok:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    # TESTING keeps the reference's compile-time 32-subframe motion grid;
    # the sample subset is passed to render_frame (see full_validation.py)
    config = TESTING
    t0 = time.perf_counter()
    scene = load_scene(data_dir=os.path.join(WORK, "data"), config=config)
    packer = DevicePacker(scene)
    print(f"load_scene: {time.perf_counter()-t0:.1f}s")

    worst = float("inf")
    for f in args.frames:
        t0 = time.perf_counter()
        setup_animation_frame(scene, f, config)
        dev = packer.pack_frame(scene)
        _, image = render_frame(config, dev, spp=args.spp)
        p = psnr(image.reshape(-1, 4)[:, :3], ref_imgs[f].reshape(-1, 4)[:, :3])
        worst = min(worst, p)
        status = "ok" if p >= args.min_psnr else "FAIL"
        print(
            f"frame {f}: PSNR {p:.2f} dB [{status}] "
            f"({time.perf_counter()-t0:.1f}s)"
        )

    print(f"worst PSNR: {worst:.2f} dB (gate {args.min_psnr})")
    return 0 if worst >= args.min_psnr else 1


if __name__ == "__main__":
    sys.exit(main())
