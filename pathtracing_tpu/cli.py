"""Command-line frame renderer (reference driver: main.cc:60-108).

    python -m pathtracing_tpu.cli --preset testing --frames 0 1 --spp 16

Renders frames of the full animated scene (or the golden test scene) to
output/frame_%04d.bmp with per-stage timing prints mirroring the
reference's, and frame-granular resume (--resume skips existing frames).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=["testing", "production"], default="testing")
    ap.add_argument("--frames", type=int, nargs=2, default=[0, 1], metavar=("BEGIN", "END"))
    ap.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    ap.add_argument("--max-bounces", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default="output")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--resume", action="store_true", help="skip existing frames")
    ap.add_argument("--tile-pixels", type=int, default=1 << 15)
    args = ap.parse_args(argv)

    from pathtracing_tpu.config import PRODUCTION, TESTING
    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.device import pack_scene
    from pathtracing_tpu.scene.loader import (
        get_animation_frame_count,
        load_scene,
        setup_animation_frame,
    )

    config = TESTING if args.preset == "testing" else PRODUCTION
    overrides = {}
    if args.spp:
        overrides["samples_per_pixel"] = args.spp
    if args.max_bounces:
        overrides["max_bounces"] = args.max_bounces
    if args.width:
        overrides["image_width"] = args.width
    if args.height:
        overrides["image_height"] = args.height
    if overrides:
        config = dataclasses.replace(config, **overrides)

    os.makedirs(args.out, exist_ok=True)

    t0 = time.perf_counter()
    scene = load_scene(data_dir=args.data_dir, config=config)
    print(
        f"EXECUTION TIME OF load_scene() : "
        f"{(time.perf_counter()-t0)*1e3:.0f}ms"
    )

    begin, end = args.frames
    end = min(end, get_animation_frame_count(config))
    total_t0 = time.perf_counter()
    for frame_index in range(begin, end):
        out_path = os.path.join(args.out, f"frame_{frame_index:04d}.bmp")
        if args.resume and os.path.exists(out_path):
            print(f"FRAME #{frame_index} exists, skipping")
            continue

        t0 = time.perf_counter()
        setup_animation_frame(scene, frame_index, config)
        dev = pack_scene(
            scene.mesh_buf.arrays(),
            scene.bvh_buf.nodes,
            scene.bvh_buf.links,
            scene.instances,
            scene.subframes,
        )
        print(
            f"FRAME #{frame_index} EXECUTION TIME OF setup_animation_frame() : "
            f"{(time.perf_counter()-t0)*1e3:.0f}ms"
        )

        t0 = time.perf_counter()
        colors, image = render_frame(
            config, dev, tile_pixels=args.tile_pixels
        )
        print(
            f"FRAME #{frame_index} EXECUTION TIME OF render() : "
            f"{(time.perf_counter()-t0)*1e3:.0f}ms"
        )

        write_bmp(out_path, image)
    print(
        f"\n\nEXECUTION TIME OF PROGRAM FOR {end-begin} FRAMES: "
        f"{(time.perf_counter()-total_t0)*1e3:.0f}ms"
    )


if __name__ == "__main__":
    main()
