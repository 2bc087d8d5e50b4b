#!/usr/bin/env python3
"""Traversal stress probe on the FULL animated scene (large-table regime).

The golden-scene probes (perf_probe.py) use ~7k triangles whose tables are
VMEM-scale; the full scene (18 meshes incl. dragon/buddha/trees + 1024
placed instances, reference: scene.cc:135-269) is the production regime
where gather locality, bf16 rows, and tuning knobs can behave differently.
Measures closest-hit primary-ray Mrays/s over a (leaf_every, schedule,
bf16) sweep, at a late animation frame so the camera sees the forest.

    python tools/stress_probe.py [--frame 900] [--rays 262144] [--quick]
"""

import argparse
import sys
import time
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(_REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=900)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--quick", action="store_true", help="skip the sweep")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--record",
        action="store_true",
        help="persist the sweep winner as the platform's large-scene "
        "tuning row (pathtracing_tpu/tuned.json)",
    )
    ap.add_argument(
        "--mk",
        action="store_true",
        help="sweep MEGAKERNEL knobs (lanes/leaf/service) on the full "
        "scene instead of the binary-walk knobs",
    )
    ap.add_argument(
        "--split",
        action="store_true",
        help="only measure the TLAS/BLAS step split + iteration quantiles "
        "(use a small --rays; O(steps^2) re-execution)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.camera import camera_from_table, get_camera_ray
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.scene.device import DevicePacker, with_bf16_nodes
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame
    from pathtracing_tpu.utils.vec import Vec2

    print("devices:", jax.devices())
    t0 = time.perf_counter()
    host = load_scene(config=TESTING)
    setup_animation_frame(host, args.frame, TESTING)
    packer = DevicePacker(host, wide=args.mk)
    scene = packer.pack_frame(host)
    n_tris = int(np.asarray(scene.tri_pos).shape[0])
    n_nodes = int(np.asarray(scene.nl8).shape[0]) // 8
    print(
        f"scene ready in {time.perf_counter()-t0:.1f}s: {n_tris} tris, "
        f"{n_nodes} nodes, nl8 {np.asarray(scene.nl8).nbytes/1e6:.1f} MB, "
        f"{len(host.instances)} instances"
    )

    # primary rays for frame pixels (subframe 0), tiled to args.rays
    R = args.rays
    W, H = TESTING.image_width, TESTING.image_height
    idx = (np.arange(R, dtype=np.int64) * 977) % (W * H)
    xs = jnp.asarray(idx % W, jnp.float32) + 0.5
    ys = jnp.asarray(idx // W, jnp.float32) + 0.5
    sf = jnp.zeros(R, jnp.int32)
    cam = camera_from_table(scene.sf_cam, sf)
    u = Vec2(jnp.full(R, 0.5, jnp.float32), jnp.full(R, 0.5, jnp.float32))
    d, org = get_camera_ray(cam, u, Vec2(xs, ys), W, H)
    tlc = scene.sf_tlas_count[sf]
    tlo = scene.sf_tlas_offset[sf]
    act = jnp.ones(R, bool)

    if args.split:
        # Where do lane-steps go? Checkpoint the one-speed loop every
        # `stride` steps and integrate active-lane counts by mode. This
        # decides whether TLAS shrinking (static-instance flattening) or
        # BLAS work is the full-scene lever.
        stride, max_steps = 16, 2048
        tlas_steps = blas_steps = 0
        prev_alive = np.ones(R, bool)
        done_at = np.full(R, -1)
        for k in range(stride, max_steps + 1, stride):
            st = ray_query(
                scene, tlc, tlo, org, d, 0.0, 1e9, act,
                max_steps=k, return_state=True, leaf_every=None,
                compact_after=None,
            )
            done = np.asarray(st.done)
            in_blas = np.asarray(st.in_blas)
            alive = ~done
            tlas_steps += int((alive & ~in_blas).sum()) * stride
            blas_steps += int((alive & in_blas).sum()) * stride
            newly = (done_at < 0) & done
            done_at[newly] = k
            if not alive.any():
                break
        tot = tlas_steps + blas_steps
        print(
            f"lane-steps: TLAS {tlas_steps} ({tlas_steps/tot:.0%}) "
            f"BLAS {blas_steps} ({blas_steps/tot:.0%})"
        )
        q = {
            f"p{p}": int(np.quantile(done_at[done_at > 0], p / 100))
            for p in (50, 90, 99, 100)
        }
        print("step quantiles (upper bounds):", q,
              "unfinished:", int((done_at < 0).sum()))
        return

    def timeit(fn, *a, n=3):
        # block_until_ready does NOT block through the axon tunnel
        # (BENCH_NOTES round-2 methodology): force a host fetch instead;
        # in-order execution makes fetching the last rep fence all reps
        float(np.asarray(fn(*a)).ravel()[0])
        t = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(np.asarray(out).ravel()[0])
        return (time.perf_counter() - t) / n

    def run(sc, label, **kw):
        fn = jax.jit(
            lambda o, dd: ray_query(
                sc, tlc, tlo, o, dd, 0.0, 1e9, act, **kw
            )[0].thit
        )
        dt = timeit(fn, org, d)
        th = fn(org, d)
        hitrate = float(jnp.mean(th > 0))
        print(
            f"{label}: {dt*1e3:7.1f} ms = {R/dt/1e6:6.2f} Mrays/s "
            f"(hit {hitrate:.0%})"
        )
        return dt

    if args.mk:
        from pathtracing_tpu.ops.megakernel import path_trace_megakernel

        n_pixels, spp = W * H, 4
        best = None
        for lanes in (8192, 12288, 16384, 32768):
            for leaf, sdiv in ((5, 2), (6, 2), (8, 2), (5, 4)):
                fn = jax.jit(
                    lambda lanes=lanes, leaf=leaf, sdiv=sdiv:
                    path_trace_megakernel(
                        TESTING, scene, n_pixels, spp, 0, lanes=lanes,
                        leaf_every=leaf, service_div=sdiv,
                    ).x
                )
                dt = timeit(fn, n=1)
                ms = n_pixels * spp / dt / 1e6
                print(
                    f"mk lanes={lanes} leaf={leaf} sdiv={sdiv}: "
                    f"{dt:.2f}s {ms:.3f} Msamples/s", flush=True,
                )
                if best is None or ms > best[0]:
                    best = (ms, lanes, leaf, sdiv)
        ms, lanes, leaf, sdiv = best
        print(f"mk winner: lanes={lanes} leaf={leaf} sdiv={sdiv} "
              f"({ms:.3f} Msamples/s)")
        if args.record:
            from pathtracing_tpu.tuning import record_tuning

            path = record_tuning(
                jax.default_backend(), "large", mk_lanes=lanes,
                mk_leaf_every=leaf, mk_service_div=sdiv,
            )
            print(f"recorded -> {path}")
        return

    base = run(scene, "default      ")
    scene5 = with_bf16_nodes(scene)
    dt5 = run(scene5, "bf16 nodes   ")
    print(f"bf16 speedup: {base/dt5:.2f}x")

    if args.quick:
        return

    sweep = {}
    for le, mid, unr in (
        (None, False, False), (4, False, False), (8, False, False),
        (12, False, False), (16, False, False), (8, True, False),
        (16, True, False), (24, True, False), (16, False, True),
        (16, True, True),
    ):
        for sched in (((32, 4),), ((32, 8),), ((16, 2), (16, 4))):
            sweep[(le, mid, unr, sched)] = run(
                scene,
                f"K={str(le):>4} mid={int(mid)} unr={int(unr)} sched={sched}",
                leaf_every=le,
                mid_entry=mid,
                unroll=unr,
                compact_schedule=sched,
            )
    (le, mid, unr, sched), best_dt = min(sweep.items(), key=lambda kv: kv[1])
    print(
        f"sweep winner: K={le} mid={int(mid)} unr={int(unr)} sched={sched} "
        f"({best_dt*1e3:.1f} ms)"
    )
    if args.record:
        from pathtracing_tpu.tuning import record_tuning

        knobs = dict(leaf_every=le, mid_entry=mid, unroll=unr)
        if len(sched) == 1:
            knobs["compact_div"] = sched[0][1]
        path = record_tuning(jax.default_backend(), "large", **knobs)
        print(f"recorded -> {path}")
    # iteration-count distribution on this ray set
    from pathtracing_tpu.ops.traversal import ray_query as rq

    done_at = np.full(R, -1)
    for steps in [32, 64, 128, 256, 512, 1024, 2048]:
        st = rq(
            scene, tlc, tlo, org, d, 0.0, 1e9, act,
            max_steps=steps, return_state=True,
        )
        done = np.asarray(st.done)
        newly = (done_at < 0) & done
        done_at[newly] = steps
    q = {
        f"p{p}": int(np.quantile(done_at[done_at > 0], p / 100))
        for p in (50, 90, 99, 100)
    }
    print("step quantiles (upper bounds):", q,
          "unfinished@2048:", int((done_at < 0).sum()))


if __name__ == "__main__":
    main()
