#!/usr/bin/env python3
"""One-shot TPU measurement session — run when the chip is healthy.

Order: health check, perf probe (gathers/traversal/iterations), Pallas
lowering probe, golden-frame render + PSNR, bench. Prints a summary that
can be pasted into memory/BENCH notes, and — unless --no-record — writes
the winning small-scene knob config to pathtracing_tpu/tuned.json
(tuning.record_tuning) so production defaults pick it up. Output is
flushed line-by-line: if the tunnel dies mid-run, partial results survive.
"""

import functools
import subprocess
import sys
import time
import pathlib

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

print = functools.partial(print, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-record", action="store_true",
                    help="don't write the sweep winner to tuned.json")
    ap.add_argument("--fast", action="store_true",
                    help="pruned sweep grid (~4x fewer compiles) for a "
                    "fragile tunnel")
    args = ap.parse_args()

    import numpy as np

    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp;"
         "jnp.arange(4.0).sum().block_until_ready(); print(jax.devices())"],
        timeout=240, capture_output=True, text=True,
    )
    if r.returncode != 0:
        print("TPU not healthy:", r.stdout, r.stderr)
        return 1
    print("health ok:", r.stdout.strip().splitlines()[-1], f"({time.perf_counter()-t0:.0f}s)")

    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.ops.pallas_traversal import ray_query_pallas
    from pathtracing_tpu.render import render_pixels
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    sg = load_golden(str(REPO / "tests/golden/scene.gold"))
    rg = load_golden(str(REPO / "tests/golden/rays.gold"))
    scene = scene_device_from_golden(sg)

    def timeit(fn, *args, n=3):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    # traversal throughput (XLA, with compaction)
    R0 = len(rg["origins"])
    for R in (65536, 262144):
        reps = (R + R0 - 1) // R0
        origins = np.tile(rg["origins"], (reps, 1))[:R]
        dirs = np.tile(rg["dirs"], (reps, 1))[:R]
        tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
        tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
        org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
        act = jnp.ones(R, bool)
        fn = jax.jit(lambda o, dd: ray_query(scene, tlc, tlo, o, dd, 0.0, 1e9, act)[0].thit)
        dt = timeit(fn, org, d)
        print(f"XLA traversal R={R}: {dt*1e3:.1f} ms = {R/dt/1e6:.2f} Mrays/s")

        # bf16-compressed node rows (20 B vs 32 B on the hottest gather)
        from pathtracing_tpu.scene.device import with_bf16_nodes

        scene5 = with_bf16_nodes(scene)
        fn5 = jax.jit(
            lambda o, dd: ray_query(scene5, tlc, tlo, o, dd, 0.0, 1e9, act)[0].thit
        )
        dt5 = timeit(fn5, org, d)
        print(
            f"XLA traversal R={R} bf16 nodes: {dt5*1e3:.1f} ms "
            f"= {R/dt5/1e6:.2f} Mrays/s ({dt/dt5:.2f}x)"
        )

        if R == 65536:
            # two-speed / compaction tuning sweep (closest-hit + any-hit).
            # Ordered most-promising-first (offline v5e prior: unroll on,
            # K=8; see tuning.py BUILTIN comments) so a tunnel death
            # mid-sweep still leaves the best candidates measured.
            combos = (
                (8, False, True), (8, True, True), (12, False, True),
                (16, False, True), (8, False, False), (None, False, False),
                (4, False, False), (12, False, False), (16, False, False),
                (8, True, False), (12, True, False), (16, True, False),
            )
            scheds = (((32, 4),), ((32, 8),), ((48, 8),),
                      ((16, 2), (16, 4)), ((16, 2), (32, 4)))
            if args.fast:
                combos = combos[:4] + ((None, False, False),)
                scheds = (((32, 4),), ((32, 8),), ((16, 2), (32, 4)))
            sweep = {}
            for anyhit in (False, True):
                for le, mid, unr in combos:
                    for sched in scheds:
                        f = jax.jit(
                            lambda o, dd, le=le, m=mid, u=unr, s=sched:
                            ray_query(
                                scene, tlc, tlo, o, dd, 0.0, 1e9, act,
                                anyhit=anyhit, leaf_every=le, mid_entry=m,
                                unroll=u, compact_schedule=s,
                            )[1 if anyhit else 0]
                        )
                        dt = timeit(f, org, d)
                        key = (le, mid, unr, sched)
                        sweep[key] = sweep.get(key, 0.0) + dt
                        print(
                            f"  sweep anyhit={int(anyhit)} K={le} "
                            f"mid={int(mid)} unroll={int(unr)} "
                            f"sched={sched}: {dt*1e3:.1f} ms "
                            f"= {R/dt/1e6:.2f} Mrays/s"
                        )
            # winner = lowest closest+anyhit total; persist so production
            # defaults (tuning.get_tuning) pick it up on this platform
            (le, mid, unr, sched), best_dt = min(
                sweep.items(), key=lambda kv: kv[1]
            )
            print(
                f"  sweep winner: K={le} mid={int(mid)} unroll={int(unr)} "
                f"sched={sched} ({best_dt*1e3:.1f} ms combined)"
            )
            if not args.no_record:
                from pathtracing_tpu.tuning import record_tuning

                knobs = dict(
                    leaf_every=le, mid_entry=mid, unroll=unr,
                )
                if len(sched) == 1:
                    knobs["compact_div"] = sched[0][1]
                path = record_tuning("tpu", "small", **knobs)
                print(f"  recorded -> {path}")

        if R == 65536:
            try:
                fnp = jax.jit(
                    lambda o, dd: ray_query_pallas(
                        scene, tlc, tlo, o, dd, 0.0, 1e9, act, interpret=False
                    )[0].thit
                )
                dt = timeit(fnp, org, d)
                print(f"PALLAS traversal R={R}: {dt*1e3:.1f} ms = {R/dt/1e6:.2f} Mrays/s")
            except Exception as e:
                print(f"PALLAS lowering failed: {type(e).__name__}: {str(e)[:300]}")

    # end-to-end golden frame
    W, H = TESTING.image_width, TESTING.image_height
    idx = np.arange(W * H, dtype=np.int32)
    t0 = time.perf_counter()
    colors = render_pixels(TESTING, scene, idx % W, idx // W, spp=8)
    dt = time.perf_counter() - t0
    print(f"golden frame 640x360@8spp: {dt:.1f}s = {W*H*8/dt/1e6:.2f} Msamples/s (incl compile)")
    t0 = time.perf_counter()
    colors = render_pixels(TESTING, scene, idx % W, idx // W, spp=8)
    dt = time.perf_counter() - t0
    print(f"golden frame steady: {dt:.1f}s = {W*H*8/dt/1e6:.2f} Msamples/s")

    # wavefront tile-size A/B (e2e, the bench.py path); records the winner
    best = (None, 1e30)
    for tp in (1 << 15, 1 << 16, 1 << 17, 1 << 18):
        render_pixels(TESTING, scene, idx % W, idx // W, spp=8,
                      tile_pixels=tp, wavefront=True)  # compile
        t0 = time.perf_counter()
        render_pixels(TESTING, scene, idx % W, idx // W, spp=8,
                      tile_pixels=tp, wavefront=True)
        dt = time.perf_counter() - t0
        print(f"  wavefront tile={tp}: {dt:.1f}s = {W*H*8/dt/1e6:.2f} Msamples/s")
        if dt < best[1]:
            best = (tp, dt)
    if not args.no_record and best[0] is not None:
        from pathtracing_tpu.tuning import record_tuning

        record_tuning("tpu", "small", tile_pixels=best[0])
        print(f"  recorded tile_pixels={best[0]}")

    ref = load_golden(str(REPO / "tests/golden/render8.gold"))["colors"]
    rel = np.abs(colors.reshape(H, W, 3) - ref) / (np.abs(ref) + 1e-3)
    print(f"vs oracle: q98 rel={np.quantile(rel, 0.98):.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
