#!/usr/bin/env python3
"""Microbenchmarks for the traversal bottleneck on the current device.

Measures, in order:
  1. raw random-gather throughput (the traversal's dominant memory pattern)
  2. traversal iterations/s on golden-scene rays (while_loop step cost)
  3. iteration-count distribution (worst-lane convergence waste)
  4. end-to-end sample throughput
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


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_gather():
    print("== gather throughput ==")
    for n_table, n_idx in [(1 << 20, 1 << 20), (1 << 16, 1 << 20), (1 << 20, 1 << 16)]:
        table = jnp.arange(n_table, dtype=jnp.float32)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, n_table, n_idx), jnp.int32
        )

        @jax.jit
        def g(t, i):
            return t[i]

        dt = timeit(g, table, idx)
        print(
            f"table {n_table>>10}K idx {n_idx>>10}K: {dt*1e3:.2f} ms "
            f"=> {n_idx*4/dt/1e9:.2f} GB/s gathered"
        )

    # row gather from (N, 8)
    table = jnp.zeros((1 << 18, 8), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 18, 1 << 20), jnp.int32
    )

    @jax.jit
    def g2(t, i):
        return t[i]

    dt = timeit(g2, table, idx)
    print(
        f"row-gather (256K,8) x 1M: {dt*1e3:.2f} ms "
        f"=> {(1<<20)*32/dt/1e9:.2f} GB/s"
    )


def bench_row_width():
    """Does row-gather cost scale with row width W?

    Decides the bf16-AABB experiment (BENCH_NOTES lever 5): nl8 rows are
    32 B; bf16-packing the AABB shrinks them to 20 B (W=5).  If gather time
    is flat in W (latency-bound) the compression buys nothing; if it scales
    with bytes, implement it.  Also measures the unpack cost: a (N,5) row
    whose first 3 floats carry 6 packed bf16 halves, expanded to 6 f32 via
    bit ops — the exact unpack the traversal step would run.
    """
    print("== row-gather width scaling ==")
    N, R = 1 << 18, 1 << 20
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, R), jnp.int32)
    for W in (4, 5, 8, 12, 16, 32):
        table = jnp.zeros((N, W), jnp.float32)

        @jax.jit
        def g(t, i):
            return t[i].sum(axis=1)

        dt = timeit(g, table, idx)
        print(
            f"(256K,{W:2d}) x 1M rows: {dt*1e3:6.2f} ms "
            f"=> {R*W*4/dt/1e9:7.2f} GB/s ({dt/R*1e9:.2f} ns/row)"
        )

    # bf16-packed row: gather (N,5), unpack 3 packed f32 -> 6 bf16 -> f32
    table5 = jnp.zeros((N, 5), jnp.float32)

    @jax.jit
    def g_unpack(t, i):
        row = t[i]
        bits = jax.lax.bitcast_convert_type(row[:, 0:3], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(bits & np.uint32(0xFFFF0000), jnp.float32)
        lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
        return (
            hi.sum(axis=1) + lo.sum(axis=1) + row[:, 3] + row[:, 4]
        )

    dt = timeit(g_unpack, table5, idx)
    print(
        f"(256K, 5)+bf16 unpack    : {dt*1e3:6.2f} ms "
        f"=> {R*20/dt/1e9:7.2f} GB/s effective ({dt/R*1e9:.2f} ns/row)"
    )


def bench_step_decomposition():
    """Decompose while_loop step cost: fixed overhead vs gather vs compute.

    Three loops at traversal-like lane counts, 64 iterations each:
      empty   — carry-increment body            => fixed per-step overhead
      gather  — one (N,8) row gather per step    => + memory cost
      slab    — gather + slab test + link follow => + compute cost
    The deltas tell which resource the real traversal step is bound by,
    which picks the next optimization (BENCH_NOTES decision tree): fixed
    => fewer/fatter steps (speculative cancel-chains), memory => bf16 rows
    (ready, flag-gated), compute => cursor-state slimming / lower K.
    """
    print("== step decomposition (64 iters) ==")
    N = 1 << 18
    ITERS = 64
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)

    for R in (65536, 262144):
        idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)

        @jax.jit
        def empty(i0):
            def body(c):
                i, acc = c
                return i + 1, acc + i

            return jax.lax.while_loop(
                lambda c: c[0] < ITERS, body, (jnp.int32(0), i0)
            )[1]

        @jax.jit
        def gather(i0):
            def body(c):
                i, ix = c
                row = table[ix]
                nix = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32) & (N - 1)
                return i + 1, nix

            return jax.lax.while_loop(
                lambda c: c[0] < ITERS, body, (jnp.int32(0), i0)
            )[1]

        @jax.jit
        def slab(i0):
            def body(c):
                i, ix, tmax = c
                row = table[ix]
                t0 = row[:, 0:3] * 0.5 - 1.0
                t1 = row[:, 3:6] * 0.5 + 1.0
                near = jnp.fmax(
                    jnp.fmin(t0[:, 0], t1[:, 0]),
                    jnp.fmax(
                        jnp.fmin(t0[:, 1], t1[:, 1]),
                        jnp.fmin(t0[:, 2], t1[:, 2]),
                    ),
                )
                far = jnp.fmin(
                    jnp.fmax(t0[:, 0], t1[:, 0]),
                    jnp.fmin(
                        jnp.fmax(t0[:, 1], t1[:, 1]),
                        jnp.fmax(t0[:, 2], t1[:, 2]),
                    ),
                )
                hit = (near <= far) & (far > 0.0) & (near < tmax)
                a = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                cxl = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
                nix = jnp.where(hit, a, cxl) & (N - 1)
                return i + 1, nix, jnp.where(hit, far, tmax)

            return jax.lax.while_loop(
                lambda c: c[0] < ITERS,
                body,
                (jnp.int32(0), i0, jnp.full(R, 1e9, jnp.float32)),
            )[1]

        te = timeit(empty, idx0) / ITERS
        tg = timeit(gather, idx0) / ITERS
        ts = timeit(slab, idx0) / ITERS
        print(
            f"R={R}: empty {te*1e6:7.1f} us/step | +gather "
            f"{(tg-te)*1e6:7.1f} | +slab {(ts-tg)*1e6:7.1f} "
            f"(total {ts*1e6:.1f} us/step, {ts/R*1e9:.2f} ns/lane)"
        )


def bench_carry_bandwidth():
    """Does a while_loop carry round-trip HBM per iteration?

    Times a loop whose body only touches C carry arrays of R lanes
    (x[i] += 1), for growing C. If time/iter scales ~linearly with C at
    the HBM rate (R*C*4*2 bytes read+write), carries are HBM-streamed and
    carry slimming is the lever; if it plateaus near zero, carries are
    VMEM/register-resident and per-iteration dispatch dominates instead.
    """
    print("== while-loop carry bandwidth ==")
    R = 1 << 18
    iters = 64
    for C in (2, 8, 16, 32):
        arrs = tuple(jnp.zeros(R, jnp.float32) + i for i in range(C))

        @jax.jit
        def run(arrs):
            def body(carry):
                step, xs = carry
                return step + 1, tuple(x + 1.0 for x in xs)

            def cond(carry):
                return carry[0] < iters

            _, xs = jax.lax.while_loop(cond, body, (jnp.int32(0), arrs))
            return xs[0]

        dt = timeit(run, arrs)
        bytes_rt = R * C * 4 * 2 * iters
        print(
            f"  C={C:3d} carry={C*4:4d} B/lane: {dt/iters*1e6:8.1f} us/iter "
            f"=> {bytes_rt/dt/1e9:7.1f} GB/s effective"
        )


def bench_traversal():
    print("== traversal ==")
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    sg = load_golden(str(_REPO / "tests/golden/scene.gold"))
    rg = load_golden(str(_REPO / "tests/golden/rays.gold"))
    scene = scene_device_from_golden(sg)

    R0 = len(rg["origins"])
    for R in [4096, 65536, 262144]:
        reps = (R + R0 - 1) // R0
        origins = np.tile(rg["origins"], (reps, 1))[:R]
        dirs = np.tile(rg["dirs"], (reps, 1))[:R]
        tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
        tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
        org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
        act = jnp.ones(R, bool)

        for leaf_every in (None, 2, 4, 8):
            fn = jax.jit(
                lambda o, dd, le=leaf_every: ray_query(
                    scene, tlc, tlo, o, dd, 0.0, 1e9, act, leaf_every=le
                )[0].thit
            )
            dt = timeit(fn, org, d, n=3)
            print(
                f"R={R} leaf_every={leaf_every}: {dt*1e3:.1f} ms "
                f"=> {R/dt/1e6:.2f} Mrays/s"
            )


def bench_iteration_counts():
    print("== iteration counts (convergence skew) ==")
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    sg = load_golden(str(_REPO / "tests/golden/scene.gold"))
    rg = load_golden(str(_REPO / "tests/golden/rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)

    # bisect per-ray completion step via max_steps sweep
    done_at = np.full(R, -1)
    for steps in [16, 32, 64, 96, 128, 192, 256, 384, 512, 768, 1024]:
        st = ray_query(
            scene, tlc, tlo, org, d, 0.0, 1e9, act, max_steps=steps, return_state=True
        )
        done = np.asarray(st.done)
        newly = (done_at < 0) & done
        done_at[newly] = steps
    print(
        "steps quantiles (upper bounds): "
        + ", ".join(
            f"p{q}={int(np.quantile(done_at[done_at>0], q/100))}"
            for q in [50, 90, 99, 100]
        )
        + f", unfinished@1024={int((done_at<0).sum())}"
    )


def main():
    print("devices:", jax.devices())
    bench_gather()
    bench_row_width()
    bench_carry_bandwidth()
    bench_step_decomposition()
    bench_traversal()
    bench_iteration_counts()


if __name__ == "__main__":
    main()
