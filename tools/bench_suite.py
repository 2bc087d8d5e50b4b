#!/usr/bin/env python3
"""Benchmark suite over the BASELINE.json measurement configs.

BASELINE.json lists five configs the reference framework is judged on;
this runs each and prints one JSON line per config:

    {"config": ..., "metric": ..., "value": ..., "unit": "Msamples/s",
     "mrays_upper": ..., "device": ..., "width": ..., "height": ...,
     "spp": ...}

Configs (names match BASELINE.json "configs"):
  bunny          bunny.obj single frame, 256x256 @ 16 spp
                 (substitute asset — the real blob is stripped, see
                 /root/reference/.MISSING_LARGE_BLOBS)
  teapot_rocks   teapot + rock0-4 static scene, 512x512 @ 64 spp
  dragon_buddha  dragon + buddha high-poly BVH stress, 1280x720 @ 256 spp
  full_anim      full terrain + forest animation scene, 1080p,
                 N-frame clip @ full spp (production preset)
  grads          forward+backward: jax.value_and_grad through the
                 renderer on the golden scene (Mrays/s/chip fwd+bwd)

    python tools/bench_suite.py [--configs a,b,...] [--scale full|small|tiny]
                                [--frames 2] [--json out.jsonl] [--cpu]

--scale small (default on CPU) quarters resolution and spp so the suite
stays minutes, not hours; full is the exact BASELINE.json spec. Results
at any scale are comparable across commits at the same scale.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time
import pathlib

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

print = functools.partial(print, flush=True)

DATA_DIR = os.environ.get("PT_DATA_DIR", "/root/reference/data")


def _tpu_alive(timeout_s: int = 180) -> bool:
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jnp.arange(4.0).sum().block_until_ready()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def _scaled(w, h, spp, scale):
    if scale == "full":
        return w, h, spp
    if scale == "small":
        return max(64, w // 4), max(64, h // 4), max(2, spp // 4)
    return 64, 64, 2  # tiny


def _emit(rec, json_path):
    line = json.dumps(rec)
    print(line)
    if json_path:
        with open(json_path, "a") as f:
            f.write(line + "\n")


def _rays_per_sample(config):
    """Upper bound (reference: path_tracer.hh:697-737): 1 primary +
    per bounce one shadow + one bounce ray."""
    return 1 + 2 * config.max_bounces


def _time_frame(config, dev, wavefront):
    from pathtracing_tpu.render import render_frame

    t0 = time.perf_counter()
    render_frame(config, dev, wavefront=wavefront)  # compile + run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    render_frame(config, dev, wavefront=wavefront)
    dt = time.perf_counter() - t0
    return dt, compile_s


def bench_builder_scene(name, meshes, instances, camera, scale, wavefront,
                        json_path, w, h, spp):
    import jax

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.scene.builder import SceneBuilder

    w, h, spp = _scaled(w, h, spp, scale)
    config = dataclasses.replace(
        TESTING, image_width=w, image_height=h, samples_per_pixel=spp
    )
    b = SceneBuilder()
    for mname, path in meshes:
        b.add_mesh(mname, path)
    for mname, kw in instances:
        b.add_instance(mname, **kw)
    b.set_camera(**camera)
    b.set_light(direction=(0.3, 1, 0.6), color=(4, 4, 4))
    t0 = time.perf_counter()
    # wide=None: attach the mega-table (megakernel fast path) on TPU
    scene, dev = b.build(config, wide=None)
    build_s = time.perf_counter() - t0
    dt, compile_s = _time_frame(config, dev, wavefront)
    ms = w * h * spp / dt / 1e6
    _emit({
        "config": name, "metric": "render_throughput",
        "value": round(ms, 4), "unit": "Msamples/s",
        "mrays_upper": round(ms * _rays_per_sample(config), 3),
        "device": jax.default_backend(),
        "width": w, "height": h, "spp": spp,
        "frame_s": round(dt, 3), "build_s": round(build_s, 2),
        "compile_s": round(compile_s, 1),
        "bvh_nodes": len(scene.bvh_buf.nodes),
    }, json_path)


def bench_full_anim(scale, frames, wavefront, json_path):
    import jax

    from pathtracing_tpu.config import PRODUCTION, TESTING
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    if scale == "full":
        config = PRODUCTION
    elif scale == "small":
        config = TESTING
    else:
        config = dataclasses.replace(
            TESTING, image_width=64, image_height=64, samples_per_pixel=8
        )
    t0 = time.perf_counter()
    host = load_scene(config=config)
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    packer = DevicePacker(host, wide=jax.default_backend() == "tpu", chunk_max=1024)
    wide_build_s = time.perf_counter() - t0
    total_px = 0.0
    total_s = 0.0
    setup_s = 0.0
    for i in range(frames):
        frame = 0 if i == 0 else i * (1800 // max(frames, 1))
        t0 = time.perf_counter()
        setup_animation_frame(
            host, frame, config,
            build_tlas_trees=jax.default_backend() != "tpu",
        )
        dev = packer.pack_frame(host)
        setup_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        render_frame(config, dev, wavefront=wavefront)
        dt = time.perf_counter() - t0
        print(f"  frame {frame}: {dt:.1f}s", file=sys.stderr)
        if i > 0:  # frame 0 pays the compile
            total_px += config.image_width * config.image_height
            total_s += dt
    spp = config.samples_per_pixel
    ms = total_px * spp / total_s / 1e6 if total_s else 0.0
    _emit({
        "config": "full_anim", "metric": "render_throughput",
        "value": round(ms, 4), "unit": "Msamples/s",
        "mrays_upper": round(ms * _rays_per_sample(config), 3),
        "device": jax.default_backend(),
        "width": config.image_width, "height": config.image_height,
        "spp": spp, "frames_timed": max(frames - 1, 0),
        "load_s": round(load_s, 1), "wide_build_s": round(wide_build_s, 1),
        "setup_s_per_frame": round(setup_s / max(frames, 1), 2),
        "megakernel": packer._wide_static is not None,
    }, json_path)


def bench_grads(scale, json_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.diff.render import make_fast_grad_frame_fn
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    # frame-structured record/replay (diff/render.make_fast_grad_frame_fn):
    # pass 1 records hit topology inside the persistent-lane MEGAKERNEL,
    # pass 2 differentiates the traversal-free replay. Gradients match
    # render_value_and_grad (tests/test_diff_fast.py).
    scene = scene_device_from_golden(
        load_golden(str(REPO / "tests/golden/scene.gold")),
        wide=True,
    )
    # the FULL golden frame at 1 spp (sky + geometry mix, the realistic
    # inverse-rendering workload); "small"/"tiny" take a slice of rows
    W, H = TESTING.image_width, TESTING.image_height
    rows = {"full": H, "small": H // 4}.get(scale, 8)
    n_pixels = W * rows
    n = n_pixels  # lane-samples per step
    # lanes: 8192 from the RECORD-MODE lane sweep (8192 runs the record
    # pass 1.45 Msamples/s vs 0.92 at 16384 / 0.54 at 32768 — BENCH_NOTES
    # "Tunnel recovered"). This intentionally differs from tuned.json's
    # forward knob (tpu/small mk_lanes=12288): record mode carries extra
    # per-lane scatter planes, so its optimum is smaller.
    fn0 = make_fast_grad_frame_fn(TESTING, n_pixels, 1, lanes=8192)
    # time by host-fetching a scalar: block_until_ready does NOT block
    # through the axon tunnel (tools/tpu_diag.py methodology); the device
    # executes in order, so fetching the last rep's loss fences all reps.
    t0 = time.perf_counter()
    float(fn0(scene)[0])
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn0(scene)
    float(out[0])
    dt = (time.perf_counter() - t0) / reps
    ms = n / dt / 1e6
    _emit({
        "config": "grads", "metric": "fwd_bwd_throughput",
        "value": round(ms, 4), "unit": "Msamples/s",
        "mrays_upper": round(ms * _rays_per_sample(TESTING), 3),
        "device": jax.default_backend(), "lanes": n,
        "compile_s": round(compile_s, 1),
    }, json_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="bunny,teapot_rocks,dragon_buddha,grads")
    ap.add_argument("--scale", default=None,
                    choices=["full", "small", "tiny"])
    ap.add_argument("--frames", type=int, default=3,
                    help="full_anim clip length (first frame not timed)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-wavefront", action="store_true")
    args = ap.parse_args()

    cpu = args.cpu or not _tpu_alive()
    if cpu:
        n_dev = min(os.cpu_count() or 8, 8)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    scale = args.scale or ("small" if jax.default_backend() == "cpu" else "full")
    wavefront = not args.no_wavefront
    print(f"# bench_suite device={jax.default_backend()} scale={scale}",
          file=sys.stderr)

    from pathtracing_tpu.scene.assets import ensure_substitutes

    gen = ensure_substitutes(str(REPO / "assets" / "generated"))
    todo = args.configs.split(",")
    if "bunny" in todo:
        bench_builder_scene(
            "bunny",
            [("bunny", gen["bunny"])],
            [("bunny", dict(pos=(0, 0, 0)))],
            dict(position=(4, 6, 14), pitch_yaw_roll=(16, 12, 0), fov=50),
            scale, wavefront, args.json, 256, 256, 16,
        )
    if "teapot_rocks" in todo:
        meshes = [("teapot", os.path.join(DATA_DIR, "teapot.obj"))] + [
            (f"rock{i}", os.path.join(DATA_DIR, f"rock{i}.obj"))
            for i in range(5)
        ]
        insts = [("teapot", dict(pos=(0, 0, 0)))] + [
            (f"rock{i}", dict(pos=(3.5 * (i - 2), 0, -4 - (i % 2) * 2),
                              pitch_yaw_roll=(0, 37.0 * i, 0)))
            for i in range(5)
        ]
        bench_builder_scene(
            "teapot_rocks", meshes, insts,
            dict(position=(0, 5, 14), pitch_yaw_roll=(12, 0, 0), fov=55),
            scale, wavefront, args.json, 512, 512, 64,
        )
    if "dragon_buddha" in todo:
        bench_builder_scene(
            "dragon_buddha",
            [("dragon", os.path.join(DATA_DIR, "dragon.obj")),
             ("buddha", os.path.join(DATA_DIR, "buddha.obj"))],
            [("dragon", dict(pos=(-6, 0, 0), pitch_yaw_roll=(0, 60, 0))),
             ("buddha", dict(pos=(6, 0, 0), pitch_yaw_roll=(0, -30, 0)))],
            dict(position=(0, 8, 22), pitch_yaw_roll=(14, 0, 0), fov=55),
            scale, wavefront, args.json, 1280, 720, 256,
        )
    if "full_anim" in todo:
        bench_full_anim(scale, args.frames, wavefront, args.json)
    if "grads" in todo:
        bench_grads(scale, args.json)
    return 0


if __name__ == "__main__":
    sys.exit(main())
