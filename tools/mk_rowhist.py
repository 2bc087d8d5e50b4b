#!/usr/bin/env python3
"""Where do the megakernel's gathered rows GO? Per-mesh row histogram.

Replays the megakernel on the full scene (CPU, bit-identical replay like
tools/mk_stats.py) and buckets every live lane-step's cursor row by the
static-region BLAS span that contains it (mapped back to the mesh name),
plus the per-frame tail (INST rows + subframe TLAS trees). This sizes the
flattening / restructuring levers: if 70% of rows hit three tree BLASes,
those are the trees to fix.

Usage: python tools/mk_rowhist.py [--frame 900] [--spp 1] [--lanes 8192]
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
           "--leaf": 4, "--service": 2}
    for i in range(0, len(args), 2):
        opt[args[i]] = int(args[i + 1])
    lanes, spp = opt["--lanes"], opt["--spp"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops import megakernel as mk
    from pathtracing_tpu.ops.wide_traversal import _wide_cheap_step, _wide_step
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    t0 = time.perf_counter()
    host = load_scene(config=TESTING)
    packer = DevicePacker(host, wide=True)
    setup_animation_frame(host, opt["--frame"], TESTING)
    scene = packer.pack_frame(host)
    print(f"frame {opt['--frame']} packed ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    # ---- static-region spans per BLAS: octant-0 root row is the first
    # row of each BLAS's contiguous span (build_wide_static allocates one
    # BLAS at a time) ----
    static = packer._wide_static
    lay = static.layout
    name_of = {}
    for nm, (m, b) in host.meshes.items():
        name_of[(b.node_offset, b.node_count)] = nm
    mask = (1 << 30) - 1
    spans = []  # (start_row, name)
    for key, root8 in static.blas_roots.items():
        rows = [(int(c) & mask) >> lay.slot_bits for c in np.asarray(root8)]
        spans.append((min(rows), name_of.get(key, str(key))))
    spans.sort()
    static_rows = static.rows.shape[0]
    bounds = np.array([s for s, _ in spans] + [static_rows], np.int64)
    names = [n for _, n in spans] + ["frame_tail"]

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

    @jax.jit
    def cheap(s):
        return s._replace(
            trav=_wide_cheap_step(scene, s.trav, mk._consts(s), s.tmin))

    sdiv = opt["--service"]

    @jax.jit
    def full_and_service(s):
        anyhit = (s.phase == mk._PH_SHADOW)
        s = s._replace(
            trav=_wide_step(scene, s.trav, mk._consts(s), s.tmin, anyhit))
        live = jnp.logical_not(s.lane_done)
        due = jnp.count_nonzero(s.trav.done & live)
        stuck = jnp.count_nonzero(jnp.logical_not(s.trav.done) & live)
        return jax.lax.cond(
            (due * sdiv >= stuck + due) | (stuck == 0),
            lambda st: mk._service(TESTING, scene, st, spp, 0, n_pixels),
            lambda st: st, s)

    nb = len(names)
    bnds = jnp.asarray(bounds)

    @jax.jit
    def histo(s):
        live = jnp.logical_not(s.lane_done) & jnp.logical_not(s.trav.done)
        kind = s.trav.cursor >> 30
        row = (s.trav.cursor & mask) >> lay.slot_bits
        seg = jnp.searchsorted(bnds[1:], row, side="right")
        seg = jnp.clip(seg, 0, nb - 1)
        out = []
        for k in (0, 1):  # WIDE, LEAF per segment
            m = live & (kind == k)
            out.append(jnp.zeros(nb, jnp.int32).at[seg].add(
                m.astype(jnp.int32)))
        out.append(jnp.zeros(nb, jnp.int32).at[seg].add(
            (live & (kind == 2)).astype(jnp.int32)))  # INST (tail rows)
        shadow = live & (s.phase == mk._PH_SHADOW)
        out.append(jnp.zeros(nb, jnp.int32).at[seg].add(
            shadow.astype(jnp.int32)))
        return jnp.stack(out)

    acc = np.zeros((4, nb), np.int64)
    steps = 0
    t0 = time.perf_counter()
    K = opt["--leaf"]
    while True:
        if not bool(np.any(~np.asarray(state.lane_done))):
            break
        for _ in range(K - 1):
            acc += np.asarray(histo(state))
            state = cheap(state)
            steps += 1
        acc += np.asarray(histo(state))
        state = full_and_service(state)
        steps += 1
        if steps % 800 == 0:
            print(f"  ... {steps} steps ({time.perf_counter()-t0:.0f}s)",
                  flush=True)

    samples = n_pixels * spp
    wide, leaf, inst, shadow = acc
    tot = acc[:3].sum()
    print(f"\nframe {opt['--frame']}: {tot/samples:.1f} traversing "
          f"rows/sample over {len(names)} segments "
          f"(shadow share {shadow.sum()/max(tot,1):.1%})")
    print(f"{'segment':16s} {'rows/smp':>9s} {'share':>7s} "
          f"{'WIDE':>7s} {'LEAF':>7s} {'INST':>7s} {'span_rows':>10s}")
    order = np.argsort(-(wide + leaf + inst))
    for i in order:
        t = wide[i] + leaf[i] + inst[i]
        if t == 0:
            continue
        span = int(bounds[i + 1] - bounds[i]) if i < nb - 1 else 0
        print(f"{names[i]:16s} {t/samples:9.1f} {t/tot:7.1%} "
              f"{wide[i]/samples:7.1f} {leaf[i]/samples:7.1f} "
              f"{inst[i]/samples:7.1f} {span:10d}")


if __name__ == "__main__":
    main()
