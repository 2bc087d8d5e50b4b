#!/usr/bin/env python3
"""Pin down WHERE the TPU traversal step cost comes from.

Round-2 context: raw traversal measured 1.8 Mrays/s at R=65536 on the v5e
(tools/tpu_session.py), ~100x below the bandwidth/VPU roofline model from
BENCH_NOTES.md. Candidate explanations, each with a discriminating
measurement here:

  H1 fixed while_loop iteration overhead  -> A (empty loop us/iter)
  H2 fixed per-gather overhead inside loops -> B vs C (loop gather vs one
     mega-gather at several sizes)
  H3 gathers lower differently in-context  -> E (optimized HLO dump)
  H4 batch too small to fill the chip      -> D (traversal at 256k/1M rays)

Run: python tools/tpu_diag.py [--hlo]
"""

import sys
import time
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

import jax
import jax.numpy as jnp

print = __import__("functools").partial(print, flush=True)


def timeit(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def a_empty_loop():
    print("== A: empty while_loop overhead ==")
    for R in (65536, 262144):
        x0 = jnp.zeros(R, jnp.float32)
        for iters in (64, 256):
            @jax.jit
            def run(x, iters=iters):
                def body(c):
                    i, x = c
                    return i + 1, x + 1.0
                return jax.lax.while_loop(
                    lambda c: c[0] < iters, body, (jnp.int32(0), x)
                )[1]
            dt = timeit(run, x0)
            print(f"  R={R} iters={iters}: {dt*1e3:.2f} ms = "
                  f"{dt/iters*1e6:.1f} us/iter")


def a2_any_cond_loop():
    print("== A2: while_loop with any()-reduction cond ==")
    for R in (65536, 262144):
        x0 = jnp.full(R, 256.0, jnp.float32)
        @jax.jit
        def run(x):
            def body(c):
                i, x = c
                return i + 1, x - 1.0
            return jax.lax.while_loop(
                lambda c: jnp.any(c[1] > 0.0), body, (jnp.int32(0), x)
            )[1]
        dt = timeit(run, x0)
        print(f"  R={R} 256 data-dep iters: {dt*1e3:.2f} ms = "
              f"{dt/256*1e6:.1f} us/iter")


def b_gather_in_loop():
    print("== B: row-gather inside while_loop ==")
    N = 1 << 18
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    ITERS = 64
    for R in (65536, 262144):
        idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)

        @jax.jit
        def run(i0):
            def body(c):
                i, ix = c
                row = table[ix]
                nix = (
                    jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                    & (N - 1)
                )
                return i + 1, nix
            return jax.lax.while_loop(
                lambda c: c[0] < ITERS, body, (jnp.int32(0), i0)
            )[1]

        dt = timeit(run, idx0)
        per = dt / ITERS
        print(f"  R={R}: {per*1e6:8.1f} us/step  "
              f"({R*32/per/1e9:6.1f} GB/s rows, {per/R*1e9:.2f} ns/lane)")

        # same loop, but the gather is fenced from fusion on both sides:
        # if THIS runs at the standalone gather rate, the slow in-loop
        # gather is a fusion/lowering artifact and optimization_barrier
        # is the fix
        @jax.jit
        def run_fenced(i0):
            def body(c):
                i, ix = c
                row = jax.lax.optimization_barrier(
                    table[jax.lax.optimization_barrier(ix)]
                )
                nix = (
                    jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                    & (N - 1)
                )
                return i + 1, nix
            return jax.lax.while_loop(
                lambda c: c[0] < ITERS, body, (jnp.int32(0), i0)
            )[1]

        dt = timeit(run_fenced, idx0)
        per = dt / ITERS
        print(f"  R={R} fenced: {per*1e6:8.1f} us/step  "
              f"({R*32/per/1e9:6.1f} GB/s rows, {per/R*1e9:.2f} ns/lane)")


def b3_unrolled_chain():
    print("== B3: data-dependent gather chain, NO loop construct ==")
    N = 1 << 18
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    STEPS = 16
    for R in (65536, 1 << 20):
        idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)

        @jax.jit
        def chain(ix):
            for _ in range(STEPS):
                row = table[ix]
                ix = (
                    jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                    & (N - 1)
                )
            return ix
        dt = timeit(chain, idx0)
        per = dt / STEPS
        print(f"  R={R}: {per*1e6:8.1f} us/step  "
              f"({R*32/per/1e9:6.1f} GB/s rows, {per/R*1e9:.2f} ns/lane)")


def b4_scan_chain():
    print("== B4: same chain inside lax.scan (static trip count) ==")
    N = 1 << 18
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    STEPS = 16
    for R in (65536, 1 << 20):
        idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)

        @jax.jit
        def chain(ix):
            def body(ix, _):
                row = table[ix]
                nix = (
                    jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                    & (N - 1)
                )
                return nix, None
            out, _ = jax.lax.scan(body, ix, None, length=STEPS)
            return out
        dt = timeit(chain, idx0)
        per = dt / STEPS
        print(f"  R={R}: {per*1e6:8.1f} us/step  "
              f"({R*32/per/1e9:6.1f} GB/s rows, {per/R*1e9:.2f} ns/lane)")


def b5_width_sweep():
    print("== B5: in-while-loop gather, row width sweep (per-row vs per-byte) ==")
    N = 1 << 16
    rng = np.random.default_rng(0)
    ITERS = 32
    R = 65536
    idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)
    for W in (8, 16, 32, 64):
        table = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)

        @jax.jit
        def run(i0, table=table, W=W):
            def body(c):
                i, ix, acc = c
                row = table[ix]
                nix = (
                    jax.lax.bitcast_convert_type(row[:, W - 1], jnp.int32)
                    & (N - 1)
                )
                return i + 1, nix, acc + row[:, 0]
            return jax.lax.while_loop(
                lambda c: c[0] < ITERS, body,
                (jnp.int32(0), i0, jnp.zeros(R, jnp.float32)),
            )[2]

        dt = timeit(run, idx0)
        per = dt / ITERS
        print(f"  W={W:3d} ({W*4:4d} B/row): {per*1e6:8.1f} us/step  "
              f"({per/R*1e9:5.2f} ns/lane, {R*W*4/per/1e9:6.1f} GB/s)")


def c_one_shot_gather():
    print("== C: one-shot row gather, size sweep (fixed-cost curve) ==")
    N = 1 << 18
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
    g = jax.jit(lambda t, i: t[i].sum(axis=1))
    for R in (8192, 65536, 262144, 1 << 20):
        idx = jnp.asarray(rng.integers(0, N, R), jnp.int32)
        dt = timeit(g, table, idx)
        print(f"  R={R:8d}: {dt*1e6:8.1f} us  "
              f"({R*32/dt/1e9:6.1f} GB/s, {dt/R*1e9:.2f} ns/row)")


def d_traversal_big_batch():
    print("== D: traversal at large R (batch-size lever) ==")
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    sg = load_golden(str(_REPO / "tests/golden/scene.gold"))
    rg = load_golden(str(_REPO / "tests/golden/rays.gold"))
    scene = scene_device_from_golden(sg)
    R0 = len(rg["origins"])
    for R in (65536, 262144, 1 << 20):
        reps = (R + R0 - 1) // R0
        origins = np.tile(rg["origins"], (reps, 1))[:R]
        dirs = np.tile(rg["dirs"], (reps, 1))[:R]
        tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
        tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
        org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
        act = jnp.ones(R, bool)
        fn = jax.jit(
            lambda o, dd: ray_query(scene, tlc, tlo, o, dd, 0.0, 1e9, act)[
                0
            ].thit
        )
        dt = timeit(fn, org, d, n=3)
        print(f"  R={R:8d}: {dt*1e3:8.1f} ms = {R/dt/1e6:6.2f} Mrays/s")


def e_hlo_dump():
    print("== E: optimized HLO of one 8-step drain ==")
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    sg = load_golden(str(_REPO / "tests/golden/scene.gold"))
    rg = load_golden(str(_REPO / "tests/golden/rays.gold"))
    scene = scene_device_from_golden(sg)
    R = 65536
    R0 = len(rg["origins"])
    reps = (R + R0 - 1) // R0
    origins = np.tile(rg["origins"], (reps, 1))[:R]
    dirs = np.tile(rg["dirs"], (reps, 1))[:R]
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    fn = jax.jit(
        lambda o, dd: ray_query(
            scene, tlc, tlo, o, dd, 0.0, 1e9, act,
            leaf_every=None, compact_after=None, max_steps=8,
            return_state=True,
        ).tmax
    )
    txt = fn.lower(org, d).compile().as_text()
    path = "/tmp/trav_drain_opt_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    import re
    gathers = re.findall(r"\n\s*(\S+) = \S+ gather\(.*", txt)
    dgathers = txt.count("dynamic-gather")
    fusions = txt.count(" fusion(")
    whiles = txt.count(" while(")
    print(f"  wrote {path}: {len(txt)} bytes")
    print(f"  gather ops: {len(gathers)}, dynamic-gather: {dgathers}, "
          f"fusions: {fusions}, whiles: {whiles}")
    for g in gathers[:8]:
        print("   ", g)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices())
    if args.hlo:
        e_hlo_dump()
        return
    a_empty_loop()
    a2_any_cond_loop()
    c_one_shot_gather()
    b_gather_in_loop()
    d_traversal_big_batch()
    e_hlo_dump()


if __name__ == "__main__":
    main()
