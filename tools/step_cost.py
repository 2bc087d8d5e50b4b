#!/usr/bin/env python3
"""Offline v5e cost model of the traversal step variants.

AOT-compiles ONE step of each traversal flavor (full / cheap / mid /
pending-flush) for a real v5e target (jax.experimental.topologies + local
libtpu, no hardware needed) and prints XLA's cost analysis: flops, bytes
accessed, and the implied HBM-bound time per step at v5e's ~819 GB/s.

This is the prior for the on-chip tuning session (tools/tpu_session.py):
per-period cost of a (K, mid_entry, unroll) config is
    (K-1) * step_cost(cheap|mid) + step_cost(flush) + step_cost(full)
plus the measured per-iteration dispatch overhead (unroll divides the
latter by K).

NOTE: XLA's "bytes accessed" is a PRE-FUSION per-op operand/result count,
not true HBM traffic — use the numbers as RELATIVE step weights, not
absolute times. Measured ratios (golden scene, 2026-08-17):
cheap 1.0 / flush 1.07 / mid 2.9 / full 4.0 — so a K=8 two-speed period
costs ~0.38x of eight one-speed full steps, and mid-entry steps only pay
off where they cut iteration counts (instance-heavy scenes).

    python tools/step_cost.py [--rays 262144] [--scene golden|full]
"""

import argparse
import sys
import pathlib

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--scene", default="golden", choices=["golden", "full"])
    ap.add_argument("--topology", default="v5e:4x2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pathtracing_tpu.ops import traversal as T
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3

    if args.scene == "golden":
        from golden_scene import scene_device_from_golden

        sg = load_golden(str(REPO / "tests/golden/scene.gold"))
        scene = scene_device_from_golden(sg)
    else:
        from pathtracing_tpu.config import TESTING
        from pathtracing_tpu.scene.device import DevicePacker
        from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

        host = load_scene(config=TESTING)
        setup_animation_frame(host, 900, TESTING)
        scene = DevicePacker(host).pack_frame(host)

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology
    )
    mesh1 = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh1, P())
    spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)

    R = args.rays
    state = T.init_state((R,), jnp.ones(R, bool), jnp.full(R, 1e9))
    zeros = jnp.zeros(R, jnp.float32)
    consts = T.make_consts(
        jnp.full(R, 8, jnp.int32), jnp.zeros(R, jnp.int32),
        Vec3(zeros, zeros, zeros), Vec3(zeros, zeros, 1.0 + zeros),
    )
    scene_specs = jax.tree.map(spec, scene)
    state_specs = jax.tree.map(spec, state)
    consts_specs = jax.tree.map(spec, consts)
    tmin = jnp.float32(0.0)
    tmin_spec = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh)

    variants = {
        "cheap": lambda sc, st, co, tm: T._cheap_step(sc, st, co, tm),
        "mid  ": lambda sc, st, co, tm: T._mid_step(sc, st, co, tm),
        "full ": lambda sc, st, co, tm: T._full_step(sc, st, co, tm, False),
        "flush": lambda sc, st, co, tm: T._flush_pending(sc, st, tm, False),
    }
    print(f"scene={args.scene} R={R} "
          f"nodes={scene.nl8.shape[0]//8} tris={scene.tri_pos.shape[0]}")
    print(f"{'step':>6} {'flops/lane':>10} {'opbytes/lane':>12} "
          f"{'rel':>6}")
    base = None
    for name, fn in variants.items():
        c = (
            jax.jit(fn, out_shardings=sh, donate_argnums=(1,))
            .lower(scene_specs, state_specs, consts_specs, tmin_spec)
            .compile()
        )
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        raw_bytes = ca.get("bytes accessed", 0.0)
        if base is None:
            base = raw_bytes
        print(f"{name:>6} {flops / R:10.1f} {raw_bytes / R:12.1f} "
              f"{raw_bytes / base:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
