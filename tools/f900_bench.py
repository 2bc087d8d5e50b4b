#!/usr/bin/env python3
"""Solo on-chip frame benchmark for the full animated scene.

Times render_pixels (megakernel fast path) at a given frame/spp with
explicit knob overrides, host-fetch timed (tools/tpu_diag.py law). One
compile per knob set; the timed pass reuses the compiled kernel.

Usage:
  python tools/f900_bench.py [--frame 900] [--spp 8] [--chunk 1024]
      [--lanes 8192[,16384,...]] [--leaf 5] [--service 4] [--repeat 2]
      [--layout w8] [--dispatch N]
"""
import argparse
import sys
import time
import pathlib

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=str, default="900")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--lanes", type=str, default="8192")
    ap.add_argument("--leaf", type=str, default="5")
    ap.add_argument("--service", type=str, default="4")
    ap.add_argument("--layout", type=str, default="w8")
    ap.add_argument("--bundle", type=int, default=8)
    ap.add_argument("--octants", type=int, default=8)
    ap.add_argument("--dispatch", type=int, default=0)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--hot", type=int, default=0,
                    help="hot-row table size H (0 = off)")
    ap.add_argument("--hotk", type=str, default="0",
                    help="hot advances per step (comma list)")
    ap.add_argument("--hotscore", type=str, default="",
                    help="per-row histogram .npy (tools/mk_hotrows.py); "
                         "default structural order")
    args = ap.parse_args()

    import os

    if args.dispatch:
        os.environ["PT_MK_DISPATCH_SAMPLES"] = str(args.dispatch)

    import jax

    from pathtracing_tpu import render as R
    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    t0 = time.perf_counter()
    host = load_scene(config=TESTING)
    score = np.load(args.hotscore) if args.hotscore else None
    packer = DevicePacker(
        host, wide=True, chunk_max=args.chunk or None,
        wide_layout=args.layout, leaf_bundle=args.bundle,
        octants=args.octants, hot_rows=args.hot, hot_score=score,
    )
    print(f"load+static: {time.perf_counter()-t0:.1f}s "
          f"(rows {packer._wide_static.rows.shape[0]}, chunk={args.chunk}, "
          f"layout={args.layout}, backend={jax.default_backend()})",
          flush=True)
    W, H = TESTING.image_width, TESTING.image_height
    idx = np.arange(W * H, dtype=np.int32)
    xs, ys = idx % W, idx // W
    n_samples = W * H * args.spp

    for frame in [int(x) for x in args.frame.split(",")]:
        t0 = time.perf_counter()
        setup_animation_frame(
            host, frame, TESTING, build_tlas_trees=False
        )
        dev = packer.pack_frame(host)
        jax.block_until_ready(dev.wide_rows)
        pack_s = time.perf_counter() - t0

        for lanes in [int(x) for x in args.lanes.split(",")]:
            for leaf in [int(x) for x in args.leaf.split(",")]:
                for sdiv in [int(x) for x in args.service.split(",")]:
                  for hotk in [int(x) for x in args.hotk.split(",")]:
                    R.DEFAULT_MK_LANES = lanes
                    R.DEFAULT_MK_LEAF = leaf
                    R.DEFAULT_MK_SERVICE = sdiv
                    R.DEFAULT_MK_HOT_K = hotk
                    t0 = time.perf_counter()
                    out = R.render_pixels(
                        TESTING, dev, xs, ys, spp=args.spp, megakernel=True
                    )
                    compile_s = time.perf_counter() - t0
                    best = None
                    for _ in range(args.repeat):
                        t0 = time.perf_counter()
                        out = R.render_pixels(
                            TESTING, dev, xs, ys, spp=args.spp,
                            megakernel=True
                        )
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                    ms = n_samples / best / 1e6
                    print(
                        f"frame={frame} lanes={lanes} leaf={leaf} "
                        f"sdiv={sdiv} hot={args.hot}/k{hotk}: "
                        f"{best:.2f}s = {ms:.3f} Msamples/s "
                        f"(pack {pack_s:.1f}s, first pass {compile_s:.1f}s, "
                        f"mean_r {float(out[:, 0].mean()):.4f})",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
