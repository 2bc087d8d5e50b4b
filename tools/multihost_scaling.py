#!/usr/bin/env python3
"""Multi-host scaling curve on a local CPU mesh.

Measures frame-parallel throughput (the pod-scale decomposition:
disjoint frames per host, zero inter-host communication during render —
SURVEY.md §2.11 "frame-parallel across hosts") at 1/2/4/8 processes and
reports parallel efficiency vs the 1-process anchor (BASELINE.md target:
>=80% linear at 2+ hosts).

Each worker: jax.distributed.initialize against a local coordinator, one
warmup frame (compile), a global psum barrier, then its round-robin share
of --frames frames, another barrier, and prints its render-phase seconds.
The parent takes the slowest worker (the pod's critical path) and derives
samples/s.

    python tools/multihost_scaling.py [--processes 1,2,4,8] [--frames 8]
                                      [--size 160x90] [--spp 4]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).parent.parent


def worker(args) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))

    from pathtracing_tpu.parallel.multihost import (
        frames_for_host,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=int(args.processes),
        process_id=args.process_id,
    )

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.render import render_frame
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    w, h = (int(v) for v in args.size.split("x"))
    config = dataclasses.replace(
        TESTING, image_width=w, image_height=h, samples_per_pixel=args.spp
    )
    scene = scene_device_from_golden(
        load_golden(str(REPO / "tests/golden/scene.gold"))
    )

    mesh = Mesh(np.array(jax.devices()), ("d",))

    def barrier():
        ones = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("d")), np.ones(1, np.float32),
            (len(jax.devices()),),
        )
        total = jax.jit(
            jax.shard_map(
                lambda x: jax.lax.psum(jnp.sum(x), "d"),
                mesh=mesh, in_specs=P("d"), out_specs=P(),
            )
        )(ones)
        assert float(total) == len(jax.devices())

    if args.mode == "sharded":
        # COMMUNICATING decomposition: every process renders the SAME
        # pixels with a disjoint sample range; the per-frame radiance is
        # psum-reduced over the ``samples`` mesh axis (the renderer's
        # gradient-accumulation-style all-reduce, parallel/sharding.py).
        # Fixed total work per frame, so ideal wall = t1 / N.
        from jax.sharding import PartitionSpec
        from pathtracing_tpu.parallel.sharding import make_sharded_render

        N = len(jax.devices())
        smesh = Mesh(
            np.array(jax.devices()).reshape(1, N), ("tiles", "samples")
        )
        assert args.spp % N == 0, (args.spp, N)
        fn = make_sharded_render(config, smesh, args.spp)
        npix = w * h
        xs_np = (np.arange(npix, dtype=np.int32) % w)
        ys_np = (np.arange(npix, dtype=np.int32) // w)
        sh = NamedSharding(smesh, PartitionSpec("tiles"))
        xs_g = jax.make_array_from_process_local_data(sh, xs_np, (npix,))
        ys_g = jax.make_array_from_process_local_data(sh, ys_np, (npix,))
        scene_dev = jax.tree.map(jnp.asarray, scene)
        r, _, _ = fn(scene_dev, xs_g, ys_g)  # warmup/compile (untimed)
        jax.block_until_ready(r)
        barrier()
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(int(args.frames)):
            r, g, b = fn(scene_dev, xs_g, ys_g)
            acc += float(jnp.sum(r[:1]))  # force a host fetch per frame
        dt = time.perf_counter() - t0
        barrier()
        print(
            f"SCALING host={args.process_id} frames={args.frames} "
            f"render_s={dt:.3f}",
            flush=True,
        )
        return 0

    render_frame(config, scene)  # warmup/compile (untimed)
    barrier()
    mine = frames_for_host(0, int(args.frames))
    t0 = time.perf_counter()
    for _ in mine:
        colors, _ = render_frame(config, scene)
    dt = time.perf_counter() - t0
    barrier()
    print(
        f"SCALING host={args.process_id} frames={len(mine)} "
        f"render_s={dt:.3f}",
        flush=True,
    )
    return 0


def _has_taskset() -> bool:
    import shutil

    return shutil.which("taskset") is not None


def run_point(processes: int, args) -> dict:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    ncores = os.cpu_count() or 1
    procs = []
    for pid in range(processes):
        # pin each "host" to one core: XLA:CPU's intra-op thread pool would
        # otherwise oversubscribe the machine and the curve would measure
        # scheduler contention, not the framework. With more processes than
        # cores the pinning doubles up — that point is core-limited and
        # reported with shared=true.
        pin = ["taskset", "-c", str(pid % ncores)] if _has_taskset() else []
        procs.append(subprocess.Popen(
            pin + [sys.executable, __file__, "--worker",
             "--coordinator", coordinator,
             "--processes", str(processes),
             "--process-id", str(pid),
             "--frames", str(args.frames),
             "--size", args.size, "--spp", str(args.spp),
             "--mode", args.mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=args.timeout)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    if any(rcs):
        for o in outs:
            print(o[-2000:])
        raise RuntimeError(f"worker exit codes {rcs}")
    times = []
    for o in outs:
        m = re.search(r"render_s=([0-9.]+)", o)
        times.append(float(m.group(1)))
    w, h = (int(v) for v in args.size.split("x"))
    total_samples = args.frames * w * h * args.spp
    wall = max(times)  # critical path = slowest host
    return {
        "processes": processes,
        "wall_s": round(wall, 3),
        "per_host_s": [round(t, 3) for t in times],
        "samples_s": round(total_samples / wall, 1),
        "cores_shared": processes > (os.cpu_count() or 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="160x90")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument(
        "--mode", choices=("frames", "sharded"), default="frames",
        help="frames = frame-parallel (no communication); sharded = "
        "the communicating samples-axis psum decomposition "
        "(parallel/sharding.make_sharded_render)",
    )
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--json", default=None)
    # worker-mode internals
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.worker:
        return worker(args)

    points = []
    base = None
    for p in (int(v) for v in args.processes.split(",")):
        rec = run_point(p, args)
        if base is None:
            base = rec["samples_s"]
        rec["speedup"] = round(rec["samples_s"] / base, 3)
        rec["efficiency"] = round(rec["samples_s"] / (base * p), 3)
        points.append(rec)
        print(json.dumps(rec), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            for rec in points:
                f.write(json.dumps(rec) + "\n")
    # points with more processes than physical cores measure core
    # oversubscription, not framework overhead — report them but score
    # only the honest ones
    scored = [r for r in points if r["processes"] >= 2 and not r["cores_shared"]]
    ok = all(r["efficiency"] >= 0.8 for r in scored)
    print(
        f"scaling target (>=80% at 2+ hosts, {len(scored)} scored points): "
        f"{'PASS' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
