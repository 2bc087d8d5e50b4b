#!/usr/bin/env python3
"""Pallas DMA-gather vs XLA gather HLO: the decisive traversal probe.

The megakernel's cost is per-lane random row gathers (BENCH_NOTES corrected
cost model: ~8-15 ns/row = ~13-24 GB/s payload, ~2% of the v5e's HBM
bandwidth). XLA's gather HLO is the only implementation tried so far; the
round-1 Pallas attempt used Mosaic's in-VMEM dynamic_gather (a VREG
permute, wrong tool). This probe tries the third implementation: a Pallas
kernel that issues PIPELINED PER-ROW DMAs from an HBM-resident table into
a VMEM output, K copies in flight (the guide's double-buffering pattern
generalized to a K-deep ring).

Timing follows tools/tpu_diag.py law: through the axon tunnel only a host
fetch blocks, so every variant is timed by np.asarray round-trips with the
work amortized inside one jitted program (REPS gathers chained by feeding
the previous result's low bits into the next index vector, preventing any
reordering/CSE).

Usage: python tools/gather_probe.py [--rows 458752] [--width 48]
                                    [--lanes 8192] [--reps 64] [--k 16]
"""
import argparse
import functools
import sys
import time
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_gather(table, idx, k: int):
    """(R,) int32 idx -> (R, W) rows via K-deep pipelined row DMAs."""
    R = idx.shape[0]
    N, W = table.shape

    def kernel(idx_ref, table_ref, out_ref, sems):
        def start(i):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sems.at[i % k]
            ).start()

        def wait(i):
            pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sems.at[i % k]
            ).wait()

        def body(i, _):
            start(i)
            # retire the copy launched k steps ago
            jax.lax.cond(i >= k, lambda: wait(i - k), lambda: None)
            return 0

        jax.lax.fori_loop(0, R, body, 0)

        def drain(i, _):
            jax.lax.cond(i >= R - k, lambda: wait(i), lambda: None)
            return 0

        jax.lax.fori_loop(max(R - k, 0), R, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, W), table.dtype),
    )(idx, table)


def chain(gather_fn, table, idx0, reps: int, n_rows: int):
    """reps dependent gathers; each feeds indices derived from the last."""

    def body(idx, _):
        rows = gather_fn(table, idx)
        nxt = (
            idx
            + jnp.abs(rows[:, 0].astype(jnp.int32))
            + jnp.int32(12345)
        ) % jnp.int32(n_rows)
        return nxt, rows[0, 0]

    idx, outs = jax.lax.scan(body, idx0, None, length=reps)
    return idx.astype(jnp.float32).sum() + outs.sum()


def chain_window(gather_fn, table, deltas, reps: int, n_rows: int,
                 window: int):
    """Dependent chain where every lane's index stays inside ONE
    ``window``-row span per step (the span itself jumps randomly step to
    step). Models treelet-clustered traversal: if DRAM page locality makes
    clustered gathers cheaper, binning rays by tree region is a real
    lever; if cost is flat in ``window``, it is not."""

    def body(base, _):
        idx = (base + deltas) % jnp.int32(n_rows)
        rows = gather_fn(table, idx)
        nxt = (
            base + jnp.abs(rows[:, 0].sum().astype(jnp.int32)) * 7919
            + jnp.int32(104729)
        ) % jnp.int32(n_rows)
        return nxt, rows[0, 0]

    base, outs = jax.lax.scan(
        body, jnp.int32(0), None, length=reps
    )
    return base.astype(jnp.float32) + outs.sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=458752)
    # NB: HBM row-DMA slices must be 128-lane aligned (Mosaic tiling), and
    # XLA pads an (N, 48) f32 table to (N, 128) in HBM anyway — so the
    # Pallas table is 128 wide for the same HBM footprint.
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-windows", action="store_true")
    args = ap.parse_args()

    N, W, R = args.rows, args.width, args.lanes
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2, (N, W)).astype(np.float32) + 0.25
    )
    idx0 = jnp.asarray(rng.integers(0, N, R), jnp.int32)

    def xla_gather(t, i):
        return jnp.take(t, i, axis=0)

    idx_indep = jnp.asarray(
        rng.integers(0, N, (args.reps, R)), jnp.int32
    )

    def indep(table, idx_rows):
        def body(acc, idx):
            rows = xla_gather(table, idx)
            return acc + rows[:, 0].sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), idx_rows)
        return acc

    harnesses = {
        "xla": jax.jit(
            functools.partial(chain, xla_gather, table, idx0, args.reps, N)
        ),
        "xla_indep": jax.jit(functools.partial(indep, table, idx_indep)),
    }
    if not args.no_pallas:
        harnesses[f"pallas_dma_k{args.k}"] = jax.jit(
            functools.partial(
                chain,
                functools.partial(pallas_gather, k=args.k),
                table, idx0, args.reps, N,
            )
        )
    for window in () if args.no_windows else (4096, 16384, 65536):
        if window >= N:
            continue
        deltas = jnp.asarray(rng.integers(0, window, R), jnp.int32)
        harnesses[f"xla_win{window//1024}k"] = jax.jit(
            functools.partial(
                chain_window, xla_gather, table, deltas, args.reps, N,
                window,
            )
        )
    for name, f in harnesses.items():
        try:
            float(f())  # compile + warm
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        rows = args.reps * R
        print(
            f"{name:18s} rows={N} lanes={R} reps={args.reps}: "
            f"best {best*1e3:.2f} ms = {best/rows*1e9:.2f} ns/row "
            f"({rows*W*4/best/1e9:.1f} GB/s payload)"
        )


if __name__ == "__main__":
    main()
