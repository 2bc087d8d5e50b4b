#!/usr/bin/env python3
"""Decide the next traversal design: fat rows vs MXU brute force.

Two hardware questions (BENCH_NOTES.md round-2 cost model, follow-ups):
  Q1  does the ~3-10 ns/row gather cost stay flat for 256..1024-col rows
      (1-4 KB)?  -> decides 16-ary wide nodes / 16-tri leaf rows.
  Q2  what do wavefront-shaped matmuls actually run at (f32/bf16,
      (R,8)@(8,3T) streamed with a running min)?  -> decides the MXU
      brute-force intersector (expected ~45 ns/ray on the golden scene).

Timing hygiene per CLAUDE.md: block_until_ready lies through the axon
tunnel; every measurement amortizes iterations INSIDE one jitted program
and is timed by a forced host scalar fetch.
"""
import sys
import time
import pathlib

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))

import numpy as np
import jax
import jax.numpy as jnp

print = __import__("functools").partial(print, flush=True)


def timed_scalar(fn, n=3):
    """fn() -> scalar array. Returns best wall time incl. one fetch."""
    float(fn())  # compile+warm
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        v = float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def q1_fat_rows():
    print("== Q1: row-gather ns/row vs width & table size ==")
    R, ITERS = 65536, 64
    key = jax.random.PRNGKey(0)
    for M in (3680, 16384, 262144):
        for W in (48, 128, 256, 512, 1024):
            if M * W * 4 > 1.2e9:
                continue
            table = jax.random.normal(key, (M, W), jnp.float32)
            i0 = jax.random.randint(key, (R,), 0, M, jnp.int32)

            @jax.jit
            def run(table=table, i0=i0, M=M):
                def body(c):
                    k, ix, acc = c
                    rows = table[ix]            # (R, W) gather
                    acc = acc + rows[:, 0]
                    ix = (ix * 1664525 + 1013904223) & (M - 1) if (
                        M & (M - 1)) == 0 else (ix * 7 + k) % M
                    return k + 1, ix, acc

                _, _, acc = jax.lax.while_loop(
                    lambda c: c[0] < ITERS, body,
                    (jnp.int32(0), i0, jnp.zeros(R, jnp.float32)))
                return acc.sum()

            dt = timed_scalar(run)
            ns_row = dt / (R * ITERS) * 1e9
            gbs = R * ITERS * W * 4 / dt / 1e9
            print(f"  M={M:7d} W={W:5d} ({W*4:5d}B): {ns_row:6.2f} ns/row"
                  f"  {gbs:7.1f} GB/s payload")


def q2_matmul():
    print("== Q2: wavefront-shaped matmul rates ==")
    key = jax.random.PRNGKey(1)
    R = 65536
    for dt_name, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for K, N in ((8, 4096), (8, 16384), (16, 8192), (128, 8192)):
            a = jax.random.normal(key, (R, K), dt_)
            b = jax.random.normal(key, (K, N), dt_)

            @jax.jit
            def run(a=a, b=b):
                def body(i, acc):
                    out = jax.lax.dot(a + acc[0, 0].astype(a.dtype), b,
                                      precision=jax.lax.Precision.DEFAULT)
                    return out[:1, :1].astype(jnp.float32) * 1e-9
                acc = jax.lax.fori_loop(
                    0, 32, body, jnp.zeros((1, 1), jnp.float32))
                return acc.sum()

            dt = timed_scalar(run)
            flops = 2.0 * R * K * N * 32
            print(f"  {dt_name} ({R},{K})@({K},{N}): "
                  f"{flops/dt/1e12:6.2f} TFLOP/s  "
                  f"{dt/32/R*1e9:6.2f} ns/ray/chunk")


def q3_bruteforce_shape():
    """Full brute-force pass shape: stream T_total tris in chunks, keep a
    running min of t. Measures ns/ray for the whole intersect."""
    print("== Q3: streamed brute-force intersect (running min) ==")
    key = jax.random.PRNGKey(2)
    R = 65536
    for T_total, chunk in ((4096, 4096), (8192, 8192), (8192, 4096),
                           (16384, 8192)):
        # ray features (R, 12): O, D, OxD, 1s — enough for edge+plane tests
        rayf = jax.random.normal(key, (R, 12), jnp.float32)
        # per-tri matrices (12, 4*T): 3 edge tests + plane numerator
        trif = jax.random.normal(key, (12, 4 * T_total), jnp.float32)

        @jax.jit
        def run(rayf=rayf, trif=trif):
            def body(i, carry):
                tmin, seed = carry
                blk = jax.lax.dynamic_slice(
                    trif, (0, i * 4 * chunk), (12, 4 * chunk))
                e = (rayf + seed) @ blk                # (R, 4*chunk)
                e = e.reshape(R, chunk, 4)
                hit = (e[..., 0] > 0) & (e[..., 1] > 0) & (e[..., 2] > 0)
                t = jnp.where(hit, e[..., 3], jnp.inf)
                tmin = jnp.minimum(tmin, t.min(axis=1))
                return tmin, seed * 1.0000001
            n_chunks = T_total // chunk
            def outer(k, carry):
                return body(k % n_chunks, carry)
            tmin, _ = jax.lax.fori_loop(
                0, 32 * n_chunks, outer,
                (jnp.full(R, jnp.inf), jnp.float32(0)))
            return tmin.min()

        dt = timed_scalar(run)
        per_pass = dt / 32
        print(f"  T={T_total:6d} chunk={chunk:6d}: {per_pass*1e3:7.2f} ms/pass"
              f"  = {per_pass/R*1e9:6.1f} ns/ray"
              f"  ({2.0*R*12*4*T_total/per_pass/1e12:5.2f} TFLOP/s)")


def main():
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "q1"):
        q1_fat_rows()
    if which in ("all", "q2"):
        q2_matmul()
    if which in ("all", "q3"):
        q3_bruteforce_shape()


if __name__ == "__main__":
    main()
