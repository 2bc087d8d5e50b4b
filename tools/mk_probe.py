#!/usr/bin/env python3
"""Megakernel TPU probe: golden scene 640x360, host-fetch timed.

Usage: python tools/mk_probe.py [lanes ...] [--leaf K1,K2] [--spp N]
       [--service D1,D2] [--layout w8,w16] [--bundle B]
Prints one line per (layout, lanes, leaf_every, service_div) combo.
"""
import sys, time, pathlib

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

import numpy as np


def main():
    args = sys.argv[1:]
    lanes_list, leafs, spp = [], [4], 8
    services, layouts, bundle = [None], ["w8"], None
    i = 0
    while i < len(args):
        if args[i] == "--leaf":
            leafs = [int(v) for v in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--spp":
            spp = int(args[i + 1])
            i += 2
        elif args[i] == "--service":
            services = [int(v) for v in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--layout":
            layouts = args[i + 1].split(",")
            i += 2
        elif args[i] == "--bundle":
            bundle = int(args[i + 1])
            i += 2
        else:
            lanes_list.append(int(args[i]))
            i += 1
    if not lanes_list:
        lanes_list = [32768]

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    g = load_golden(str(_REPO / "tests" / "golden" / "scene.gold"))
    W, H = TESTING.image_width, TESTING.image_height
    n_pixels = W * H
    import jax

    for layout in layouts:
        scene = scene_device_from_golden(
            g, wide=True, leaf_bundle=bundle, wide_layout=layout
        )
        rows = scene.wide_rows.shape
        print(f"layout={layout}: mega table {rows[0]} x {rows[1]} "
              f"({rows[0] * rows[1] * 4 / 1e6:.1f} MB)", flush=True)
        for lanes in lanes_list:
            for leaf in leafs:
                for sdiv in services:
                    fn = jax.jit(
                        lambda scene=scene, lanes=lanes, leaf=leaf, sdiv=sdiv:
                        path_trace_megakernel(
                            TESTING, scene, n_pixels, spp, 0, lanes=lanes,
                            leaf_every=leaf, service_div=sdiv,
                        )
                    )
                    acc = fn()  # compile+run
                    _ = float(acc.x[0])
                    t0 = time.perf_counter()
                    acc = fn()
                    s = float(np.asarray(acc.x).sum())  # force host fetch
                    dt = time.perf_counter() - t0
                    ms = n_pixels * spp / dt / 1e6
                    print(
                        f"layout={layout} lanes={lanes} leaf={leaf} "
                        f"service={sdiv} spp={spp}: {dt:.2f}s"
                        f" {ms:.3f} Msamples/s (checksum {s:.1f})",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
