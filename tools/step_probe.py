#!/usr/bin/env python3
"""Direct on-chip cost of the megakernel's traversal step.

Loads the full scene at --frame, captures the megakernel's initial state
(while-loop intercept, as tools/mk_stats.py), advances it to a
steady-state mix with N warm steps, then times three fori_loops on the
REAL state and tables (host-fetch timed, K large enough to clear the
dispatch floor):

  cheap   the production _wide_cheap_step (gather + slab + links + INST)
  strip   gather-only step: cursor -> row gather -> next cursor derived
          from the row bits with ~10 VPU ops — isolates the gather
  vpu     the cheap step with the row REUSED from a fixed cached gather
          (index 0) — isolates the VPU+carry cost

cheap ~ strip  => gather-bound: row bytes/count are the only lever.
cheap ~ vpu + strip => additive; attack the larger share.

Usage: python tools/step_probe.py [--frame 900] [--lanes 8192]
                                  [--steps 4000] [--chunk 1024] [--warm 600]
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
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--warm", type=int, default=600)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--octants", type=int, default=8)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops import megakernel as mk
    from pathtracing_tpu.ops.wide_traversal import _wide_cheap_step
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    t0 = time.perf_counter()
    if args.frame < 0:
        # golden scene (small-table fast-gather regime)
        sys.path.insert(0, str(_REPO / "tests"))
        from pathtracing_tpu.utils.goldenio import load_golden
        from golden_scene import scene_device_from_golden

        scene = scene_device_from_golden(
            load_golden(str(_REPO / "tests" / "golden" / "scene.gold")),
            wide=True,
        )
    else:
        host = load_scene(config=TESTING)
        packer = DevicePacker(host, wide=True, chunk_max=args.chunk or None, octants=args.octants)
        setup_animation_frame(host, args.frame, TESTING)
        scene = packer.pack_frame(host)
    print(f"packed ({time.perf_counter()-t0:.0f}s) "
          f"rows={scene.wide_rows.shape} backend={jax.default_backend()}",
          flush=True)

    n_pixels = TESTING.image_width * TESTING.image_height

    trace = {}
    real_while = jax.lax.while_loop
    jax.lax.while_loop = lambda c, b, i: trace.setdefault("init", i) or i
    try:
        mk.path_trace_megakernel(
            TESTING, scene, n_pixels, args.spp, 0, lanes=args.lanes,
            leaf_every=4,
        )
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
                trav=_wide_cheap_step(scene, s.trav, mk._consts(s), s.tmin)
            )
        return jax.lax.fori_loop(0, args.warm, body, s)

    state = warm(state)
    trav0 = state.trav
    live = int(np.count_nonzero(~np.asarray(state.trav.done)))
    print(f"steady state: {live}/{R} lanes traversing after {args.warm} "
          f"warm steps", flush=True)

    K = args.steps

    @jax.jit
    def run_cheap(tr):
        def body(i, tr):
            return _wide_cheap_step(scene, tr, consts, tmin)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.cursor.astype(jnp.uint32).sum() + tr.tmax.sum()

    @jax.jit
    def run_strip(tr):
        # gather-only chain: the next cursor comes from the gathered row's
        # bits (same dependency structure as the real step), everything
        # else dropped
        lay_mask = jnp.uint32((1 << 27) - 1)

        def body(i, cur):
            row = scene.wide_rows[
                (cur >> jnp.uint32(3) & lay_mask).astype(jnp.int32)
                % scene.wide_rows.shape[0]
            ]
            bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
            nxt = bits[:, 24] ^ (bits[:, 0] & jnp.uint32(7))
            return nxt

        cur = jax.lax.fori_loop(0, K, body, tr.cursor)
        return cur.sum()

    @jax.jit
    def run_vpu(tr):
        # the cheap step's full VPU body, but the gather index pinned to a
        # single cached row (gather degenerates to a broadcast load)
        def body(i, tr):
            tr2 = tr._replace(cursor=jnp.zeros_like(tr.cursor))
            out = _wide_cheap_step(scene, tr2, consts, tmin)
            return out._replace(cursor=tr.cursor)
        tr = jax.lax.fori_loop(0, K, body, tr)
        return tr.tmax.sum()

    # Row-count sweep on the strip chain: same dependent walk over
    # leading-row slices of the real table. Sizes the hot/cold-split
    # lever: if small tables gather several-x faster, the tree's hot top
    # belongs in its own table.
    size_fns = []
    for Nr in (131072, 163840, 196608, 229376, 262144, 393216, scene.wide_rows.shape[0]):
        tblN = jnp.asarray(scene.wide_rows[:Nr])

        def mk_sfn(tblN=tblN, Nr=Nr):
            @jax.jit
            def run(tr):
                lay_mask = jnp.uint32((1 << 27) - 1)

                def body(i, cur):
                    row = tblN[
                        (cur >> jnp.uint32(3) & lay_mask).astype(jnp.int32)
                        % Nr
                    ]
                    bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
                    return bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7))

                cur = jax.lax.fori_loop(0, K, body, tr.cursor)
                return cur.sum()

            return run

        size_fns.append((f"strip_n{Nr//1024}k", mk_sfn()))

    # range-confined variants on the FULL table: distinguishes "small
    # table allocation" from "small index range" — if range is what
    # matters, hot-first row ordering of the one big table captures the
    # fast regime with no layout change
    full_tbl = jnp.asarray(scene.wide_rows)
    NFULL = scene.wide_rows.shape[0]
    for label, lo, span in (
        ("range32k@0", 0, 32768),
        ("range32k@mid", min(262144, NFULL - 32768), 32768),
    ):

        def mk_rfn(lo=lo, span=span):
            @jax.jit
            def run(tr):
                lay_mask = jnp.uint32((1 << 27) - 1)

                def body(i, cur):
                    row = full_tbl[
                        lo
                        + (cur >> jnp.uint32(3) & lay_mask).astype(jnp.int32)
                        % span
                    ]
                    bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
                    return bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7))

                cur = jax.lax.fori_loop(0, K, body, tr.cursor)
                return cur.sum()

            return run

        size_fns.append((f"strip_{label}", mk_rfn()))

    # Row-width sweep on the strip chain: the same dependent random walk
    # over tables that are the wide table column-sliced / zero-padded to
    # width W. Answers whether gather cost scales with row bytes (then a
    # 32-col quantized layout pays) or is width-flat.
    width_fns = []
    for Wd in (24, 32, 48, 96, 128):
        if Wd <= scene.wide_rows.shape[1]:
            tbl = scene.wide_rows[:, :Wd]
        else:
            tbl = jnp.pad(
                scene.wide_rows,
                ((0, 0), (0, Wd - scene.wide_rows.shape[1])),
            )
        tbl = jnp.asarray(tbl)

        def mk_fn(tbl=tbl):
            @jax.jit
            def run(tr):
                lay_mask = jnp.uint32((1 << 27) - 1)

                def body(i, cur):
                    row = tbl[
                        (cur >> jnp.uint32(3) & lay_mask).astype(jnp.int32)
                        % tbl.shape[0]
                    ]
                    bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
                    nxt = bits[:, 20] ^ (bits[:, 0] & jnp.uint32(7))
                    return nxt

                cur = jax.lax.fori_loop(0, K, body, tr.cursor)
                return cur.sum()

            return run

        width_fns.append((f"strip_w{Wd}", mk_fn()))

    @jax.jit
    def run_full(tr):
        def body(i, tr):
            return _wide_step(scene, tr, consts, tmin, jnp.zeros(R, bool))
        return jax.lax.fori_loop(0, K // 4, body, tr).tmax.sum()

    @jax.jit
    def run_service(s0):
        def body(i, s):
            return mk._service(TESTING, scene, s, args.spp, 0,
                               230400)
        s = jax.lax.fori_loop(0, K // 8, body, s0)
        return s.acc_r.sum() + s.cur.x.sum()

    from pathtracing_tpu.ops.wide_traversal import _wide_step

    svc_fns = [("full", lambda tr, _s=state: run_full(tr)),
               ("service", lambda tr, _s=state: run_service(_s))]

    for name, fn in ([("cheap", run_cheap)] + svc_fns + size_fns):
        v = float(fn(trav0))  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(trav0))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:6s}: {best:.3f}s for {K} steps x {R} lanes = "
              f"{best/K*1e6:.1f} us/step = {best/K/R*1e9:.2f} ns/lane-step",
              flush=True)


if __name__ == "__main__":
    main()
