#!/usr/bin/env python3
"""Per-ROW gather frequency of the megakernel on the full scene.

Sizes the hot-region one-hot MXU gather (VERDICT r4 ask #1): replays the
production schedule on CPU (bit-identical; same structure as
tools/mk_rowhist.py) and accumulates a full per-row histogram of live
traversing lanes' cursor rows, then reports

  * top-K row concentration for K in {256..8192} (how much of the gather
    traffic a K-row one-hot table could serve),
  * the share of the CONTIGUOUS [static inst_base, table end) range
    (static chunk-INST rows + static TLAS + per-frame tail) — the hot set
    reachable with pure cursor arithmetic, no table reorder,
  * burst statistics for that range (consecutive hot steps per lane),
    which set the efficiency of a frozen-cold-lane hot gear.

Usage: python tools/mk_hotrows.py [--frame 900] [--spp 1] [--lanes 8192]
"""
import sys
import time
import pathlib

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    args = sys.argv[1:]
    opt = {"--frame": 900, "--spp": 1, "--lanes": 8192,
           "--leaf": 4, "--service": 4, "--bake": 0}
    for i in range(0, len(args), 2):
        opt[args[i]] = int(args[i + 1])
    lanes, spp = opt["--lanes"], opt["--spp"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops import megakernel as mk
    from pathtracing_tpu.ops.wide_traversal import (
        _wide_cheap_step, _wide_step,
    )
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    t0 = time.perf_counter()
    host = load_scene(config=TESTING)
    packer = DevicePacker(host, wide=True, chunk_max=1024,
                      bake_static=bool(opt['--bake']))
    setup_animation_frame(host, opt["--frame"], TESTING,
                          build_tlas_trees=False)
    scene = packer.pack_frame(host)
    print(f"frame {opt['--frame']} packed ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    static = packer._wide_static
    lay = static.layout
    static_rows = static.rows.shape[0]
    n_rows = scene.wide_rows.shape[0]
    mask = (1 << 30) - 1
    # static region layout: [chunk trees][chunk INST rows][static TLAS]
    # inst_base = first INST row = lowest row of the static INST block;
    # recover from static_root8 (TLAS root) and the INST cursors embedded
    # in the TLAS rows — cheaper: scan static rows' cursors is overkill;
    # chunk trees end where INST rows start, which _inst_chunk_rows set at
    # the row_cursor AFTER all chunk trees. Recover by finding the min
    # INST-kind row referenced from the static TLAS root region:
    # simplest robust recovery: the static TLAS root row id.
    tlas_root_row = (int(static.static_root8[0]) & mask) >> lay.slot_bits
    print(f"table: {n_rows} rows ({n_rows*lay.w_row*4/1e6:.0f} MB), "
          f"static {static_rows}, tail {n_rows - static_rows}, "
          f"static TLAS root row {tlas_root_row}", flush=True)

    n_pixels = TESTING.image_width * TESTING.image_height

    trace = {}
    real_while = jax.lax.while_loop
    jax.lax.while_loop = lambda c, b, i: trace.setdefault("init", i) or i
    try:
        mk.path_trace_megakernel(TESTING, scene, n_pixels, spp, 0,
                                 lanes=lanes, leaf_every=opt["--leaf"])
    finally:
        jax.lax.while_loop = real_while
    state = trace["init"][0]

    K = opt["--leaf"]
    sdiv = opt["--service"]

    def one_step(s, full):
        consts = mk._consts(s)
        if not full:
            return s._replace(
                trav=_wide_cheap_step(scene, s.trav, consts, s.tmin))
        anyhit = (s.phase == mk._PH_SHADOW) | (s.phase == mk._PH_SHADOW2)
        s = s._replace(
            trav=_wide_step(scene, s.trav, consts, s.tmin, anyhit))
        live = jnp.logical_not(s.lane_done)
        due = jnp.count_nonzero(s.trav.done & live)
        stuck = jnp.count_nonzero(jnp.logical_not(s.trav.done) & live)
        return jax.lax.cond(
            (due * sdiv >= stuck + due) | (stuck == 0),
            lambda st: mk._service(TESTING, scene, st, spp, 0, n_pixels),
            lambda st: st, s)

    def snap(s, hist, hot_steps, hot_entries, prev_hot):
        live = jnp.logical_not(s.lane_done) & jnp.logical_not(s.trav.done)
        row = ((s.trav.cursor & mask) >> lay.slot_bits).astype(jnp.int32)
        hist = hist.at[jnp.where(live, row, n_rows)].add(1)
        hot = live & (row >= tlas_root_row)
        hot_steps = hot_steps + jnp.count_nonzero(hot)
        hot_entries = hot_entries + jnp.count_nonzero(
            hot & jnp.logical_not(prev_hot))
        return hist, hot_steps, hot_entries, hot

    @jax.jit
    def period(s, hist, hs, he, ph):
        for i in range(K):
            hist, hs, he, ph = snap(s, hist, hs, he, ph)
            s = one_step(s, full=(i == K - 1))
        return s, hist, hs, he, ph

    hist = jnp.zeros(n_rows + 1, jnp.int32)
    hs = jnp.int32(0)
    he = jnp.int32(0)
    ph = jnp.zeros(lanes, bool)
    steps = 0
    t0 = time.perf_counter()
    while True:
        if not bool(np.any(~np.asarray(state.lane_done))):
            break
        state, hist, hs, he, ph = period(state, hist, hs, he, ph)
        steps += K
        if steps % 800 < K:
            print(f"  ... {steps} steps ({time.perf_counter()-t0:.0f}s)",
                  flush=True)

    hist = np.asarray(hist[:-1], np.int64)
    hs, he = int(hs), int(he)
    samples = n_pixels * spp
    tot = hist.sum()
    print(f"\nframe {opt['--frame']}: {tot/samples:.1f} traversing "
          f"rows/sample, {tot} total over {steps} steps "
          f"x {lanes} lanes (live util {tot/(steps*lanes):.1%})")

    order = np.argsort(-hist)
    csum = np.cumsum(hist[order])
    print(f"\n{'top-K rows':>12s} {'share':>8s}")
    for k in (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384):
        if k <= n_rows:
            print(f"{k:12d} {csum[k-1]/tot:8.1%}")

    hot_tot = hist[tlas_root_row:].sum()
    hot_rows = n_rows - tlas_root_row
    print(f"\ncontiguous [static TLAS root, end): {hot_rows} rows, "
          f"share {hot_tot/tot:.1%}")
    inst_share = 0.0
    print(f"burst stats for that range: {hs} hot lane-steps, "
          f"{he} entries -> avg burst {hs/max(he,1):.2f} steps")

    # where do the top-1024 rows live?
    top = order[:1024]
    n_in_hot = int((top >= tlas_root_row).sum())
    n_in_tail = int((top >= static_rows).sum())
    print(f"top-1024 rows: {n_in_hot} in [TLAS root, end), "
          f"{n_in_tail} in the tail, {1024 - n_in_hot} in chunk trees")
    # chunk-tree hot rows: print the 40 hottest with their share
    print("\nhottest 40 rows (row, share, cum):")
    c = 0
    for i in range(40):
        r = order[i]
        c += hist[r]
        seg = ("tail" if r >= static_rows else
               "tlas" if r >= tlas_root_row else "chunk")
        print(f"  {r:8d} {seg:5s} {hist[r]/tot:7.2%} {c/tot:7.2%}")
    np.save(str(_REPO / "build" / f"rowhist_f{opt['--frame']}.npy"), hist)
    print("\nsaved build/rowhist_f*.npy")


if __name__ == "__main__":
    main()
