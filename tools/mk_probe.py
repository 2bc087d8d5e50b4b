#!/usr/bin/env python3
"""Megakernel TPU probe: golden scene 640x360 @ 8 spp, host-fetch timed.

Usage: python tools/mk_probe.py [lanes ...] [--leaf K] [--spp N]
Prints one line per (lanes, leaf_every) combo.
"""
import sys, time, pathlib

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

import numpy as np


def main():
    args = sys.argv[1:]
    lanes_list, leafs, spp = [], [4], 8
    i = 0
    while i < len(args):
        if args[i] == "--leaf":
            leafs = [int(v) for v in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--spp":
            spp = int(args[i + 1])
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

    scene = scene_device_from_golden(
        load_golden(str(_REPO / "tests" / "golden" / "scene.gold")), wide=True
    )
    W, H = TESTING.image_width, TESTING.image_height
    n_pixels = W * H
    import jax

    for lanes in lanes_list:
        for leaf in leafs:
            fn = jax.jit(
                lambda: path_trace_megakernel(
                    TESTING, scene, n_pixels, spp, 0, lanes=lanes,
                    leaf_every=leaf,
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
                f"lanes={lanes} leaf={leaf} spp={spp}: {dt:.2f}s"
                f" {ms:.3f} Msamples/s (checksum {s:.1f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
