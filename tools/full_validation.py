#!/usr/bin/env python3
"""The reference's FULL validation workflow, end to end, on all 1800 frames.

Reproduces the course pipeline (reference: validator.py:10-52,
README.md:63-77): half-resolution golden PNGs per frame, own renders as
frame_%04d.bmp, PSNR >= 32 dB per frame, validation_result.txt verdict.
The golden PNGs were course-provided downloads; here they are regenerated
by the reference's OWN code — tools/oracle/harness.cc `animframe` compiles
/root/reference/scene.cc + path_tracer.hh unmodified and renders each
frame with the same seeds (substitute assets for the three stripped blobs
on BOTH sides, scene/assets.py).

Orchestration: a pool of oracle worker processes keeps the CPU cores busy
producing golden PNGs while this process renders our frames (TPU megakernel
frame loop when the chip answers, CPU otherwise). Both sides resume:
existing files are skipped, so a killed run continues where it stopped.

    python tools/full_validation.py [--frames 1800] [--spp 8] [--stride 1]
                                    [--workers 3] [--out build/validation]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from full_scene_parity import WORK, build_harness, prepare_assets  # noqa: E402


def oracle_worker(harness, work, frames, spp, ref_dir):
    """Subprocess entry: render golden half-res PNGs for ``frames`` (an
    arithmetic stripe). Uses the harness's batch `animrange` mode — ONE
    load_scene() per run of missing frames instead of one per frame —
    then converts each .gold to the course-style half-res PNG."""
    from PIL import Image

    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.validate import RESIZE_FACTOR, downscale_local_mean

    missing = [
        f for f in frames
        if not os.path.exists(os.path.join(ref_dir, f"{f:04d}.png"))
    ]
    if not missing:
        return
    step = frames[1] - frames[0] if len(frames) > 1 else 1
    prefix = os.path.join(ref_dir, "tmp_")
    # contiguous runs of the stripe -> one batch render each
    runs = [[missing[0], 1]]
    for f in missing[1:]:
        if f == runs[-1][0] + runs[-1][1] * step:
            runs[-1][1] += 1
        else:
            runs.append([f, 1])
    def convert(fs):
        for f in fs:
            gold = f"{prefix}{f:04d}.gold"
            g = load_golden(gold)
            bgra = np.asarray(g["image_bgra"])
            rgb = bgra[..., [2, 1, 0]]
            half = downscale_local_mean(rgb, RESIZE_FACTOR).astype(np.uint8)
            Image.fromarray(half).save(os.path.join(ref_dir, f"{f:04d}.png"))
            os.remove(gold)

    # sub-batches of <=64 frames bound the on-disk .gold footprint
    for first, count in runs:
        for lo in range(0, count, 64):
            n = min(64, count - lo)
            subprocess.run(
                [harness, "animrange", work, str(first + lo * step), str(n),
                 str(step), str(spp), prefix],
                check=True,
            )
            convert(first + (lo + k) * step for k in range(n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1800)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "build", "validation"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--list", default="",
                    help="explicit comma-separated frame list (overrides "
                         "--frames/--stride; e.g. the motion-heavy chase "
                         "frames for the 256-spp pass)")
    ap.add_argument("--oracle-only", action="store_true")
    ap.add_argument("--render-only", action="store_true")
    # worker-mode internals
    ap.add_argument("--oracle-worker", type=int, default=None)
    args = ap.parse_args()

    args.out = os.path.abspath(args.out)
    ref_dir = os.path.join(args.out, "reference")
    own_dir = os.path.join(args.out, "own")
    os.makedirs(ref_dir, exist_ok=True)
    os.makedirs(own_dir, exist_ok=True)
    frames = (
        [int(x) for x in args.list.split(",")] if args.list
        else list(range(0, args.frames, args.stride))
    )

    harness = build_harness()
    prepare_assets()

    if args.oracle_worker is not None:
        mine = [f for i, f in enumerate(frames)
                if i % args.workers == args.oracle_worker]
        oracle_worker(harness, WORK, mine, args.spp, ref_dir)
        return 0

    # ---- oracle pool. ONE multi-threaded harness is the right shape on
    # this box: the full scene's ~50 MB working set thrashes the shared
    # cache when N copies run side by side (measured 50+ core-s/frame at
    # 4x1-thread vs 6.4 at 1x4-thread) ----
    pool = []
    if not args.render_only:
        threads = max(1, (os.cpu_count() or 4) // args.workers)
        env = dict(os.environ, OMP_NUM_THREADS=str(threads))
        for w in range(args.workers):
            pool.append(subprocess.Popen(
                [sys.executable, __file__, "--oracle-worker", str(w),
                 "--workers", str(args.workers),
                 "--frames", str(args.frames), "--stride", str(args.stride),
                 "--spp", str(args.spp), "--out", args.out]
                + (["--list", args.list] if args.list else []),
                env=env,
            ))
    if args.oracle_only:
        rcs = [p.wait() for p in pool]
        return 1 if any(rcs) else 0

    # ---- our side: TESTING-res frames through the frame loop ----
    from pathtracing_tpu.utils.platform import ensure_backend

    backend = "cpu" if args.cpu else ensure_backend()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"own renderer backend: {backend}", flush=True)

    import dataclasses

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    # Keep the TESTING config's 32-subframe motion-blur grid and render a
    # sample SUBSET: the reference binary is compiled with
    # SAMPLES_PER_PIXEL=256, so its subframe times are i/32 of the frame
    # interval regardless of how many samples the harness actually draws
    # (reference: config.hh:14-18, scene.cc:648-650, path_tracer.hh:655).
    # Replacing samples_per_pixel would rescale OUR subframe grid to
    # i/ceil(spp/8) and diverge above 8 spp (caught by the 64-spp
    # validation pass: 7/18 frames < 32 dB before this fix).
    config = TESTING
    t0 = time.perf_counter()
    scene = load_scene(data_dir=os.path.join(WORK, "data"), config=config)
    packer = DevicePacker(scene, wide=backend == "tpu", chunk_max=1024)
    print(f"load_scene+packer: {time.perf_counter()-t0:.1f}s", flush=True)

    from concurrent.futures import ThreadPoolExecutor

    todo = [
        f for f in frames
        if not os.path.exists(os.path.join(own_dir, f"frame_{f:04d}.bmp"))
    ]

    def setup_pack(f):
        # the wide/megakernel path never reads the binary subframe TLAS
        # trees (the chunked tail rebuilds from the instance list), so
        # skip the 32 per-frame builds there (~5-10 s host time/frame)
        setup_animation_frame(
            scene, f, config, build_tlas_trees=backend != "tpu"
        )
        return packer.pack_frame(scene)

    host_pool = ThreadPoolExecutor(max_workers=1)
    nxt = host_pool.submit(setup_pack, todo[0]) if todo else None
    t_all = time.perf_counter()
    for i, f in enumerate(todo):
        dev = nxt.result()
        if i + 1 < len(todo):
            nxt = host_pool.submit(setup_pack, todo[i + 1])
        t0 = time.perf_counter()
        _, image = render_frame(config, dev, spp=args.spp)
        write_bmp(os.path.join(own_dir, f"frame_{f:04d}.bmp"), image)
        if i % 50 == 0:
            done_n = i + 1
            rate = (time.perf_counter() - t_all) / done_n
            print(
                f"own frame {f} ({done_n}/{len(todo)}, "
                f"{time.perf_counter()-t0:.1f}s, avg {rate:.1f}s/frame)",
                flush=True,
            )

    rcs = [p.wait() for p in pool]
    if any(rcs):
        print(f"oracle workers failed: {rcs}")
        return 1

    # ---- the reference validator, verbatim semantics ----
    from pathtracing_tpu import validate

    os.chdir(args.out)
    rc = validate.main(
        [ref_dir, own_dir, "--frames", str(args.frames)]
        + (["--allow-missing-reference"]
           if (args.stride > 1 or args.list) else [])
    )
    print(f"validation_result.txt written to {args.out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
