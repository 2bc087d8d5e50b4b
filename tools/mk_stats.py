#!/usr/bin/env python3
"""Step-kind accounting for the persistent-lane megakernel (CPU).

Replays path_trace_megakernel's while loop step by step (cheap steps and
the period's full step driven individually) and tallies, per step, how
many live lanes' cursors point at each mega-table row kind (WIDE / LEAF /
INST / sentinel). On TPU every step is one row gather per lane (~8 ns,
BENCH_NOTES round-2 model), so `lane-steps x 8 ns` estimates the gather
floor and the kind split sizes the fat-row levers: a 16-ary interior
cuts WIDE steps ~25%, an 8-triangle leaf row cuts LEAF steps ~50%.

Usage: python tools/mk_stats.py [--pixels N] [--spp N] [--lanes N]
                                [--scene golden|full] [--frame N]
(defaults: golden scene, full 640x360 frame, spp 1, lanes 32768;
--scene full loads the animated forest scene at --frame via the same
loader + DevicePacker(wide) path the frame loop uses)
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
    opt = {"--pixels": 640 * 360, "--spp": 1, "--lanes": 32768,
           "--leaf": 4, "--service": 8, "--scene": "golden", "--frame": 0,
           "--chunk": 0}
    for i in range(0, len(args), 2):
        v = args[i + 1]
        opt[args[i]] = v if args[i] == "--scene" else int(v)
    n_pixels, spp, lanes = opt["--pixels"], opt["--spp"], opt["--lanes"]
    sdiv = opt["--service"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops import megakernel as mk
    from pathtracing_tpu.ops.wide_traversal import (
        _wide_cheap_step,
        _wide_step,
    )

    if opt["--scene"] == "full":
        from pathtracing_tpu.scene.device import DevicePacker
        from pathtracing_tpu.scene.loader import (
            load_scene,
            setup_animation_frame,
        )

        t0 = time.perf_counter()
        host = load_scene(config=TESTING)
        packer = DevicePacker(
            host, wide=True, chunk_max=opt["--chunk"] or None
        )
        setup_animation_frame(host, opt["--frame"], TESTING)
        scene = packer.pack_frame(host)
        print(f"full scene frame {opt['--frame']} loaded+packed "
              f"({time.perf_counter()-t0:.0f}s, chunk={opt['--chunk']})",
              flush=True)
    else:
        from pathtracing_tpu.utils.goldenio import load_golden
        from golden_scene import scene_device_from_golden

        scene = scene_device_from_golden(
            load_golden(str(_REPO / "tests" / "golden" / "scene.gold")),
            wide=True,
        )

    leaf_every = opt["--leaf"]

    # Grab the initial loop state by intercepting the while_loop call.
    trace = {}
    real_while = jax.lax.while_loop

    def capture_while(cond, body, init):
        trace["init"] = init
        return init

    jax.lax.while_loop = capture_while
    try:
        mk.path_trace_megakernel(
            TESTING, scene, n_pixels, spp, 0, lanes=lanes,
            leaf_every=leaf_every,
        )
    finally:
        jax.lax.while_loop = real_while
    # the loop carry is (state, period) since the round-3 safety bound
    state = trace["init"][0]

    @jax.jit
    def cheap(s):
        return s._replace(
            trav=_wide_cheap_step(scene, s.trav, mk._consts(s), s.tmin)
        )

    @jax.jit
    def full_and_service(s):
        anyhit = s.phase == mk._PH_SHADOW
        s = s._replace(
            trav=_wide_step(scene, s.trav, mk._consts(s), s.tmin, anyhit)
        )
        live = jnp.logical_not(s.lane_done)
        due = jnp.count_nonzero(s.trav.done & live)
        stuck = jnp.count_nonzero(jnp.logical_not(s.trav.done) & live)
        do_service = (due * sdiv >= stuck + due) | (stuck == 0)
        return jax.lax.cond(
            do_service,
            lambda st: mk._service(TESTING, scene, st, spp, 0, n_pixels),
            lambda st: st,
            s,
        ), do_service

    @jax.jit
    def stats(s):
        live = jnp.logical_not(s.lane_done) & jnp.logical_not(s.trav.done)
        kind = s.trav.cursor >> 30
        out = [jnp.count_nonzero(live & (kind == k)) for k in range(4)]
        out.append(jnp.count_nonzero(jnp.logical_not(s.lane_done)))
        out.append(jnp.count_nonzero(s.trav.done
                                     & jnp.logical_not(s.lane_done)))
        out.append(jnp.count_nonzero(live & (s.phase == mk._PH_SHADOW)))
        return jnp.stack(out)

    kinds = np.zeros(4, np.int64)
    live_tot = done_wait = shadow_tot = 0
    periods = services = steps = 0
    t0 = time.perf_counter()
    while True:
        live_now = int(np.count_nonzero(~np.asarray(state.lane_done)))
        if live_now == 0:
            break
        for _ in range(leaf_every - 1):
            st = np.asarray(stats(state))
            kinds += st[:4]
            live_tot += int(st[4])
            done_wait += int(st[5])
            shadow_tot += int(st[6])
            state = cheap(state)
            steps += 1
        st = np.asarray(stats(state))
        kinds += st[:4]
        live_tot += int(st[4])
        done_wait += int(st[5])
        shadow_tot += int(st[6])
        state, did = full_and_service(state)
        steps += 1
        services += int(did)
        periods += 1
        if periods % 100 == 0:
            print(f"  ... {periods} periods, {live_now} live "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    dt = time.perf_counter() - t0
    samples = n_pixels * spp
    lane_steps = steps * lanes
    active = int(kinds.sum())
    names = ["WIDE", "LEAF", "INST", "SENT"]
    print(f"pixels={n_pixels} spp={spp} lanes={lanes} K={leaf_every}")
    print(f"periods={periods} services={services} steps={steps} "
          f"({dt:.0f}s CPU)")
    print(f"gathered rows/sample = {lane_steps/samples:.1f} "
          f"(~{lane_steps/samples*8/1e3:.2f} us/sample at 8 ns/row "
          f"=> ~{1/(lane_steps/samples*8e-9)/1e6:.2f} Msamples/s ceiling)")
    print(f"lane utilization: traversing={active/lane_steps:.2%} "
          f"done-waiting={done_wait/lane_steps:.2%} "
          f"lane_done={1-(active+done_wait)/lane_steps:.2%}")
    print(f"shadow-phase share of traversing steps: "
          f"{shadow_tot/max(active,1):.2%}")
    for k in range(4):
        print(f"  {names[k]:4s}: {kinds[k]/samples:7.2f} rows/sample "
              f"({kinds[k]/max(active,1):6.2%} of traversing lane-steps)")


if __name__ == "__main__":
    main()
