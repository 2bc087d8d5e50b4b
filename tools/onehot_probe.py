#!/usr/bin/env python3
"""Price the hot-region one-hot MXU gather vs small-table takes (r5 #1).

Synthetic tables with random u32 bit patterns (covers bf16-packed AABB
words, link words, transforms). All variants run a DEPENDENT index chain
(next index derived from the gathered row's bits) inside one fori_loop
with >=1-2 s of device work per timed call and are timed by host-fetching
a scalar (tools/tpu_diag.py methodology; block_until_ready does not block
through the axon tunnel).

Variants:
  big       (512k, 48) f32 hardware gather        — reproduces the ~60 ns law
  takeH     (H, 48) separate-table hardware gather, uniform indices
  takeHdup  same, ~25% of lanes on row 0 (hot-row duplication regime)
  onehotH   byte-plane bf16 one-hot matmul, bit-exact (4 planes, one
            (R,H)@(H,192) matmul, f32 accumulate, u32 reassembly)
  int8H     same with int8 planes / s8xs8->s32 MXU path (if supported)

Exactness: every one-hot/int8 variant is verified bit-equal to a direct
gather on-device before timing.

Usage: python tools/onehot_probe.py [--lanes 8192] [--steps 4000]
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
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--width", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R, K, W = args.lanes, args.steps, args.width
    print(f"backend={jax.default_backend()} lanes={R} steps={K}", flush=True)

    rng = np.random.default_rng(7)

    def rand_table(n):
        # random u32 bit patterns, avoiding NaN-signaling-heavy all-ones
        t = rng.integers(0, 2**32, size=(n, W), dtype=np.uint64)
        return t.astype(np.uint32)

    def planes_bf16(tbl_u32):
        ps = [((tbl_u32 >> (8 * b)) & 0xFF).astype(np.float32)
              for b in range(4)]
        return jnp.asarray(
            np.concatenate(ps, axis=1), dtype=jnp.bfloat16
        )  # (H, 4W)

    def planes_i8(tbl_u32):
        ps = [(((tbl_u32 >> (8 * b)) & 0xFF).astype(np.int32) - 128)
              .astype(np.int8) for b in range(4)]
        return jnp.asarray(np.concatenate(ps, axis=1))  # (H, 4W) int8

    def reassemble_f32(prod, W):
        # prod: (R, 4W) f32 with exact byte values 0..255
        b = [prod[:, i * W:(i + 1) * W].astype(jnp.uint32) for i in range(4)]
        word = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
        return word

    def reassemble_i8(prod, W):
        # prod: (R, 4W) i32 with exact values -128..127
        b = [(prod[:, i * W:(i + 1) * W] + 128).astype(jnp.uint32)
             for i in range(4)]
        return b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)

    idx0 = jnp.asarray(rng.integers(0, 2**31, size=R).astype(np.int32))

    results = {}

    def timeit(name, fn, arg, steps):
        v = jax.device_get(fn(arg))  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.device_get(fn(arg))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        ns = best / steps / R * 1e9
        results[name] = ns
        print(f"{name:14s}: {best:.3f}s / {steps} steps = "
              f"{ns:.2f} ns/lane-step", flush=True)

    # ---------------- big-table baseline ----------------
    NBIG = 1 << 19
    big_u32 = rand_table(NBIG)
    big = jnp.asarray(big_u32.view(np.float32))

    @jax.jit
    def run_big(idx):
        def body(i, cur):
            row = big[cur % NBIG]
            bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
            return (bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7))).astype(
                jnp.int32) & jnp.int32(0x7FFFFFFF)
        return jax.lax.fori_loop(0, K, body, idx).sum()

    timeit("big512k", run_big, idx0, K)

    for H in (1024, 2048, 4096):
        tbl_u32 = rand_table(H)
        tbl = jnp.asarray(tbl_u32.view(np.float32))
        pb = planes_bf16(tbl_u32)
        iota = jnp.arange(H, dtype=jnp.int32)

        # -------- hardware take on the small separate table --------
        def mk_take(tbl=tbl, H=H, dup=False):
            @jax.jit
            def run(idx):
                def body(i, cur):
                    c = cur % H
                    if dup:
                        # ~25% of lanes pinned to row 0, 25% spread over
                        # the top 64 — the hot-traffic duplication shape
                        c = jnp.where((cur & 3) == 0, 0, c)
                        c = jnp.where((cur & 3) == 1, c % 64, c)
                    row = tbl[c]
                    bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
                    return (bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7))
                            ).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
                return jax.lax.fori_loop(0, K, body, idx).sum()
            return run

        timeit(f"take{H}", mk_take(), idx0, K)
        timeit(f"take{H}dup", mk_take(dup=True), idx0, K)

        # -------- one-hot bf16 byte-plane matmul --------
        def mk_onehot(pb=pb, H=H, iota=iota):
            @jax.jit
            def run(idx):
                def body(i, cur):
                    c = cur % H
                    oh = (iota[None, :] == c[:, None]).astype(jnp.bfloat16)
                    prod = jax.lax.dot_general(
                        oh, pb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    word = reassemble_f32(prod, W)
                    return (word[:, 20] ^ (word[:, 0] & jnp.uint32(7))
                            ).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
                return jax.lax.fori_loop(0, K, body, idx).sum()
            return run

        # exactness first
        c = np.asarray(idx0) % H
        oh = (np.arange(H)[None, :] == c[:, None])
        direct = tbl_u32[c]
        got = np.asarray(jax.jit(lambda idx: reassemble_f32(
            jax.lax.dot_general(
                (iota[None, :] == (idx % H)[:, None]).astype(jnp.bfloat16),
                pb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32),
            W))(idx0))
        exact = bool((got == direct).all())
        print(f"onehot{H} bf16 exact: {exact}", flush=True)
        if exact:
            timeit(f"onehot{H}", mk_onehot(), idx0, K)

        # -------- int8 planes --------
        try:
            pi = planes_i8(tbl_u32)

            def mk_i8(pi=pi, H=H, iota=iota):
                @jax.jit
                def run(idx):
                    def body(i, cur):
                        c = cur % H
                        oh = (iota[None, :] == c[:, None]).astype(jnp.int8)
                        prod = jax.lax.dot_general(
                            oh, pi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        word = reassemble_i8(prod, W)
                        return (word[:, 20] ^ (word[:, 0] & jnp.uint32(7))
                                ).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
                    return jax.lax.fori_loop(0, K, body, idx).sum()
                return run

            got = np.asarray(jax.jit(lambda idx: reassemble_i8(
                jax.lax.dot_general(
                    (iota[None, :] == (idx % H)[:, None]).astype(jnp.int8),
                    pi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32),
                W))(idx0))
            exact = bool((got == direct).all())
            print(f"int8_{H} exact: {exact}", flush=True)
            if exact:
                timeit(f"int8_{H}", mk_i8(), idx0, K)
        except Exception as e:  # int8 dot unsupported on some backends
            print(f"int8_{H}: unsupported ({type(e).__name__}: {e})",
                  flush=True)

    print("\nsummary (ns/lane-step):")
    for k, v in results.items():
        print(f"  {k:14s} {v:8.2f}")


if __name__ == "__main__":
    main()
