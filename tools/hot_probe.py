#!/usr/bin/env python3
"""Isolate the hot-advance cost inside the real frame-900 state.

Times, on the real packed scene (step_probe methodology: captured
megakernel state, fori chains, host-fetch, >=1 s device work):

  cheap      production _wide_cheap_step (baseline)
  hot        _wide_cheap_step(hot=True) — the full hot advance
  fetch      one-hot matmul fetch only + index chain
  novpu      hot advance with the matmul replaced by a row-0 broadcast
             (isolates VPU + gating/select cost)
  take       small-table hardware gather fetch only (the rejected variant,
             for the record: prices in-kernel staging contention)

Usage: python tools/hot_probe.py [--frame 900] [--lanes 8192]
       [--steps 2000] [--hot 1024]
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
    ap.add_argument("--frame", type=int, default=900)
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--warm", type=int, default=600)
    ap.add_argument("--hot", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops import megakernel as mk
    from pathtracing_tpu.ops.wide_traversal import (
        _onehot_row, _wide_cheap_step,
    )
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    t0 = time.perf_counter()
    host = load_scene(config=TESTING)
    score = np.load(str(_REPO / "build" / f"rowhist_f{args.frame}.npy"))
    packer = DevicePacker(host, wide=True, chunk_max=1024,
                          hot_rows=args.hot, hot_score=score)
    setup_animation_frame(host, args.frame, TESTING, build_tlas_trees=False)
    scene = packer.pack_frame(host)
    print(f"packed ({time.perf_counter()-t0:.0f}s) "
          f"rows={scene.wide_rows.shape} hot={scene.hot_planes.shape} "
          f"backend={jax.default_backend()}", flush=True)

    n_pixels = TESTING.image_width * TESTING.image_height
    trace = {}
    real_while = jax.lax.while_loop
    jax.lax.while_loop = lambda c, b, i: trace.setdefault("init", i) or i
    try:
        mk.path_trace_megakernel(TESTING, scene, n_pixels, 8, 0,
                                 lanes=args.lanes, leaf_every=4)
    finally:
        jax.lax.while_loop = real_while
    state = trace["init"][0]
    R = args.lanes
    consts = mk._consts(state)
    tmin = state.tmin

    @jax.jit
    def warm(s):
        def body(i, s):
            return s._replace(
                trav=_wide_cheap_step(scene, s.trav, mk._consts(s), s.tmin))
        return jax.lax.fori_loop(0, args.warm, body, s)

    state = warm(state)
    trav0 = state.trav
    live = int(np.count_nonzero(~np.asarray(state.trav.done)))
    mask = (1 << 27) - 1
    rows_now = (np.asarray(trav0.cursor) >> 3) & mask
    nhot = int(((rows_now < args.hot) & ~np.asarray(trav0.done)).sum())
    print(f"steady state: {live}/{R} traversing, {nhot} at hot rows",
          flush=True)

    K = args.steps

    @jax.jit
    def run_cheap(tr):
        def body(i, tr):
            return _wide_cheap_step(scene, tr, consts, tmin)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    @jax.jit
    def run_hot(tr):
        def body(i, tr):
            return _wide_cheap_step(scene, tr, consts, tmin, hot=True)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    @jax.jit
    def run_fetch(tr):
        H = scene.hot_planes.shape[0]

        def body(i, cur):
            row = _onehot_row(scene.hot_planes, (cur % H).astype(jnp.int32))
            bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
            return ((bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7)))
                    & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        cur = jax.lax.fori_loop(
            0, K, body, tr.cursor.astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
        )
        return cur.sum()

    @jax.jit
    def run_novpu(tr):
        # hot advance body with the fetch replaced by a broadcast row
        row0 = scene.hot_rows[0]

        def body(i, tr):
            import pathtracing_tpu.ops.wide_traversal as wt
            saved = wt._onehot_row
            try:
                wt._onehot_row = lambda planes, idx: jnp.broadcast_to(
                    row0, (idx.shape[0], row0.shape[0]))
                out = _wide_cheap_step(scene, tr, consts, tmin, hot=True)
            finally:
                wt._onehot_row = saved
            return out
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    @jax.jit
    def run_take(tr):
        H = scene.hot_rows.shape[0]

        def body(i, cur):
            row = scene.hot_rows[(cur % H).astype(jnp.int32)]
            bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
            return ((bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7)))
                    & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        cur = jax.lax.fori_loop(
            0, K, body, tr.cursor.astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
        )
        return cur.sum()

    @jax.jit
    def run_pair(tr):
        def body(i, tr):
            tr = _wide_cheap_step(scene, tr, consts, tmin)
            return _wide_cheap_step(scene, tr, consts, tmin, hot=True)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    @jax.jit
    def run_pair2(tr):
        def body(i, tr):
            tr = _wide_cheap_step(scene, tr, consts, tmin)
            tr = _wide_cheap_step(scene, tr, consts, tmin, hot=True)
            return _wide_cheap_step(scene, tr, consts, tmin, hot=True)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    for name, fn in (("cheap", run_cheap), ("hot", run_hot),
                     ("fetch", run_fetch), ("novpu", run_novpu),
                     ("take", run_take), ("pair", run_pair),
                     ("pair2", run_pair2)):
        v = float(fn(trav0))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(trav0))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:6s}: {best:.3f}s / {K} = "
              f"{best/K/R*1e9:.2f} ns/lane-step", flush=True)


if __name__ == "__main__":
    main()


