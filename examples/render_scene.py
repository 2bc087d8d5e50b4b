#!/usr/bin/env python3
"""Example: compose and render a custom scene with the public API.

    python examples/render_scene.py --mesh dragon --spp 16 --out dragon.bmp

Defaults to the high-poly dragon + buddha BVH stress configuration from
BASELINE.json when --mesh all is given.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=os.environ.get("PT_DATA_DIR", "/root/reference/data"))
    ap.add_argument("--mesh", default="dragon", help="mesh stem, or 'all' for dragon+buddha stress")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--out", default="output/example.bmp")
    args = ap.parse_args()

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.builder import SceneBuilder

    config = dataclasses.replace(
        TESTING,
        image_width=args.width,
        image_height=args.height,
        samples_per_pixel=args.spp,
    )

    b = SceneBuilder()
    if args.mesh == "all":
        b.add_mesh("dragon", os.path.join(args.data_dir, "dragon.obj"))
        b.add_mesh("buddha", os.path.join(args.data_dir, "buddha.obj"))
        b.add_mesh("teapot", os.path.join(args.data_dir, "teapot.obj"))
        b.add_instance("dragon", pos=(-6, 0, 0), pitch_yaw_roll=(0, 60, 0))
        b.add_instance("buddha", pos=(6, 0, 0), pitch_yaw_roll=(0, -30, 0))
        b.add_instance("teapot", pos=(0, 0, 3))
        b.set_camera(position=(0, 8, 22), pitch_yaw_roll=(14, 0, 0), fov=55)
    else:
        b.add_mesh(args.mesh, os.path.join(args.data_dir, f"{args.mesh}.obj"))
        b.add_instance(args.mesh, pos=(0, 0, 0))
        b.set_camera(position=(4, 6, 14), pitch_yaw_roll=(16, 12, 0), fov=50)
    b.set_light(direction=(0.3, 1, 0.6), color=(4, 4, 4))

    t0 = time.perf_counter()
    scene, dev = b.build(config)
    print(f"build: {time.perf_counter()-t0:.1f}s "
          f"({scene.mesh_buf.vertex_count} verts, {len(scene.bvh_buf.nodes)} BVH nodes)")

    t0 = time.perf_counter()
    colors, image = render_frame(config, dev)
    dt = time.perf_counter() - t0
    n = args.width * args.height * args.spp
    print(f"render: {dt:.1f}s = {n/dt/1e6:.2f} Msamples/s")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_bmp(args.out, image)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
