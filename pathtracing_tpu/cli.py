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
    ap.add_argument(
        "--model",
        choices=["full_animation", "teapot_rocks", "cornell_box", "sphere_ground"],
        default="full_animation",
        help="scene preset (pathtracing_tpu/models); full_animation is the "
        "reference's animated scene, the others are static",
    )
    ap.add_argument("--frames", type=int, nargs=2, default=[0, 1], metavar=("BEGIN", "END"))
    ap.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    ap.add_argument("--max-bounces", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default="output")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--resume", action="store_true", help="skip existing frames")
    ap.add_argument(
        "--tile-pixels", type=int, default=None,
        help="pixels per wavefront tile (default: platform tuning table)",
    )
    ap.add_argument(
        "--sample-range",
        type=int,
        nargs=2,
        metavar=("A", "B"),
        help="render only samples [A,B) per frame, writing partial "
        "accumulations (frame_NNNN.part_A_B.npz) instead of BMPs; "
        "partials from any machine merge with --merge",
    )
    ap.add_argument(
        "--merge",
        action="store_true",
        help="merge partial sample accumulations in --out into BMPs",
    )
    ap.add_argument(
        "--metrics",
        default=None,
        help="append JSON-lines per-frame metrics to this file",
    )
    ap.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler device trace of the first frame",
    )
    ap.add_argument(
        "--wavefront",
        action="store_true",
        help="use the path-regeneration wavefront kernel (ops/wavefront.py)",
    )
    ap.add_argument(
        "--wide",
        choices=["auto", "1", "0"],
        default="auto",
        help="attach the wide-BVH mega-table fast path (accel/wide.py; "
        "enables the persistent-lane megakernel on TPU). auto = on when "
        "the backend is tpu",
    )
    ap.add_argument(
        "--shard",
        action="store_true",
        help="shard each frame over all local devices (tiles axis)",
    )
    ap.add_argument(
        "--adaptive",
        type=int,
        default=None,
        metavar="BASE_SPP",
        help="variance-guided adaptive sampling: uniform BASE_SPP pass, "
        "then allocate the remaining (spp - BASE_SPP) x pixels budget "
        "where the luminance variance is (pathtracing_tpu/adaptive.py)",
    )
    ap.add_argument(
        "--aovs",
        action="store_true",
        help="also write frame_NNNN.aovs.npz (albedo/normal/depth/coverage "
        "primary-hit buffers, pathtracing_tpu/aov.py)",
    )
    args = ap.parse_args(argv)

    if args.adaptive is not None:
        if args.sample_range or args.shard:
            ap.error("--adaptive cannot combine with --sample-range/--shard")
        spp_total = args.spp or (
            256 if args.preset == "testing" else 1024
        )
        if not (1 <= args.adaptive <= spp_total):
            ap.error(f"--adaptive BASE must be in [1, spp={spp_total}]")

    if args.merge:
        return merge_partials(args)

    # Survive a wedged TPU tunnel: probe in a subprocess, fall back to CPU
    # (touching a dead axon backend in-process hangs forever; CLAUDE.md).
    from pathtracing_tpu.utils.platform import ensure_backend

    backend = ensure_backend()
    print(f"backend: {backend}", flush=True)

    from pathtracing_tpu.config import PRODUCTION, TESTING
    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.device import DevicePacker
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

    wide = (backend == "tpu") if args.wide == "auto" else args.wide == "1"
    t0 = time.perf_counter()
    if args.model != "full_animation":
        from pathtracing_tpu import models

        kw = (
            {"data_dir": args.data_dir}
            if args.data_dir and args.model == "teapot_rocks"
            else {}
        )
        if args.model == "teapot_rocks":
            kw["wide"] = wide
        _, static_dev = models.build(args.model, config, **kw)
        scene = packer = None
    else:
        scene = load_scene(data_dir=args.data_dir, config=config)
        packer = DevicePacker(scene, wide=wide, chunk_max=1024 if wide else None)
    print(
        f"EXECUTION TIME OF load_scene() : "
        f"{(time.perf_counter()-t0)*1e3:.0f}ms"
    )

    from pathtracing_tpu.utils.profiling import MetricsLog, trace_to
    import contextlib

    metrics = MetricsLog(args.metrics)

    begin, end = args.frames
    if args.model != "full_animation":
        end = min(end, begin + 1)  # static scene: one frame
    else:
        end = min(end, get_animation_frame_count(config))

    todo = []
    for frame_index in range(begin, end):
        out_path = os.path.join(args.out, f"frame_{frame_index:04d}.bmp")
        if args.resume and os.path.exists(out_path):
            print(f"FRAME #{frame_index} exists, skipping")
            continue
        todo.append((frame_index, out_path))

    def setup_pack(frame_index):
        """Host-side frame prep: animation eval + subframe TLAS builds + pack.

        Runs on a worker thread for frame N+1 while the device renders frame
        N (the reference's TLAS build is likewise host work off the render's
        critical path, scene.cc:698-710). Safe because the render only touches
        the already-packed device tables, never `scene`.
        """
        if scene is None:
            return static_dev, 0.0  # static preset: already packed
        t0 = time.perf_counter()
        setup_animation_frame(scene, frame_index, config)
        dev = packer.pack_frame(scene)
        return dev, time.perf_counter() - t0

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    total_t0 = time.perf_counter()
    next_fut = pool.submit(setup_pack, todo[0][0]) if todo else None
    for i, (frame_index, out_path) in enumerate(todo):
        dev, setup_s = next_fut.result()
        if i + 1 < len(todo):
            next_fut = pool.submit(setup_pack, todo[i + 1][0])
        print(
            f"FRAME #{frame_index} EXECUTION TIME OF setup_animation_frame() : "
            f"{setup_s*1e3:.0f}ms"
        )

        profile_ctx = (
            trace_to(args.profile_dir)
            if args.profile_dir and frame_index == begin
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        image = None
        with profile_ctx:
            if args.sample_range:
                a, b = args.sample_range
                from pathtracing_tpu.render import render_pixels

                W, H = config.image_width, config.image_height
                idx = np.arange(W * H, dtype=np.int32)
                sums = render_pixels(
                    config, dev, idx % W, idx // W,
                    spp=b - a, sample_base=a, average=False,
                    tile_pixels=args.tile_pixels, wavefront=args.wavefront,
                ).reshape(H, W, 3)
                part = os.path.join(
                    args.out, f"frame_{frame_index:04d}.part_{a}_{b}.npz"
                )
                np.savez_compressed(part, sums=sums, sample_range=(a, b))
            elif args.shard:
                from pathtracing_tpu.parallel.multihost import local_device_mesh
                from pathtracing_tpu.parallel.sharding import render_frame_sharded
                from pathtracing_tpu.render import to_bgra

                colors = render_frame_sharded(
                    config, dev, local_device_mesh(), wavefront=args.wavefront
                )
                image = to_bgra(colors)
            elif args.adaptive is not None:
                from pathtracing_tpu.adaptive import render_adaptive
                from pathtracing_tpu.render import to_bgra

                W, H = config.image_width, config.image_height
                idx = np.arange(W * H, dtype=np.int32)
                colors, counts = render_adaptive(
                    config, dev, idx % W, idx // W,
                    spp_base=args.adaptive, spp_total=config.samples_per_pixel,
                    tile_pixels=args.tile_pixels, wavefront=args.wavefront,
                )
                colors = colors.reshape(H, W, 3)
                print(
                    f"FRAME #{frame_index} adaptive samples/pixel: "
                    f"min={counts.min()} mean={counts.mean():.1f} "
                    f"max={counts.max()}"
                )
                image = to_bgra(colors)
            else:
                colors, image = render_frame(
                    config, dev, tile_pixels=args.tile_pixels,
                    wavefront=args.wavefront,
                )
            if args.aovs:
                from pathtracing_tpu.aov import render_aovs

                W, H = config.image_width, config.image_height
                idx = np.arange(W * H, dtype=np.int32)
                aovs = render_aovs(
                    config, dev, idx % W, idx // W,
                    spp=min(config.samples_per_pixel, 8),
                    tile_pixels=args.tile_pixels,
                )
                np.savez_compressed(
                    os.path.join(args.out, f"frame_{frame_index:04d}.aovs.npz"),
                    **{k: v.reshape(H, W, -1).squeeze() for k, v in aovs.items()},
                )
        dt = time.perf_counter() - t0
        n_samples = config.image_width * config.image_height * (
            (args.sample_range[1] - args.sample_range[0])
            if args.sample_range
            else config.samples_per_pixel
        )
        print(
            f"FRAME #{frame_index} EXECUTION TIME OF render() : {dt*1e3:.0f}ms "
            f"({n_samples/dt/1e6:.2f} Msamples/s)"
        )
        metrics.frame(frame_index, setup_s, dt, n_samples, config.max_bounces)

        if image is not None:
            write_bmp(out_path, image)
    print(
        f"\n\nEXECUTION TIME OF PROGRAM FOR {end-begin} FRAMES: "
        f"{(time.perf_counter()-total_t0)*1e3:.0f}ms"
    )


def merge_partials(args):
    """Merge frame_NNNN.part_A_B.npz partial sums into tonemapped BMPs.

    The sample-range seeding contract makes partials order-independent and
    machine-independent; overlapping or missing ranges are reported.
    """
    import glob
    import re

    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.render import to_bgra

    pattern = re.compile(r"frame_(\d{4})\.part_(\d+)_(\d+)\.npz$")
    frames: dict = {}
    for path in sorted(glob.glob(os.path.join(args.out, "frame_*.part_*.npz"))):
        m = pattern.search(path)
        if not m:
            continue
        frames.setdefault(int(m.group(1)), []).append(
            (int(m.group(2)), int(m.group(3)), path)
        )

    if not frames:
        print(f"no partials found in {args.out}")
        return 1

    for frame_index, parts in sorted(frames.items()):
        parts.sort()
        covered = []
        total = None
        n_samples = 0
        for a, b, path in parts:
            data = np.load(path)
            sums = data["sums"]
            total = sums if total is None else total + sums
            n_samples += b - a
            covered.append((a, b))
        # coverage check
        merged_ok = True
        pos = covered[0][0]
        for a, b in covered:
            if a != pos:
                merged_ok = False
            pos = b
        if not merged_ok:
            print(f"FRAME #{frame_index}: WARNING ranges {covered} have gaps/overlap")
        colors = total / np.float32(n_samples)
        image = to_bgra(colors)
        out_path = os.path.join(args.out, f"frame_{frame_index:04d}.bmp")
        write_bmp(out_path, image)
        print(f"FRAME #{frame_index}: merged {n_samples} spp from {len(parts)} partials -> {out_path}")
    return 0


if __name__ == "__main__":
    main()
