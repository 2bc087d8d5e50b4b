#!/usr/bin/env python3
"""Offline v5e compile-check: AOT-compile every device path for a REAL TPU
target without TPU hardware.

jax.experimental.topologies provides an abstract v5e topology backed by the
local libtpu compiler, so `jit(...).lower(...).compile()` runs the full
XLA:TPU pipeline (including Mosaic for Pallas kernels) and surfaces
TPU-only compile errors, memory footprints, and optimized HLO — exactly
what you cannot get when the axon tunnel is down.

    python tools/aot_check.py [--dump-hlo DIR]

Checks: integrator (scan), wavefront renderer, 8-chip sharded render
(tiles x samples mesh, psum collectives), traversal query, and the Pallas
kernel's Mosaic lowering (expected to FAIL on current Mosaic — same-shape
dynamic_gather only; the XLA path is the production path).
"""

from __future__ import annotations

import argparse
import functools
import sys
import pathlib

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--topology", default="v5e:4x2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.ops.wavefront import path_trace_wavefront
    from pathtracing_tpu.ops.traversal import ray_query
    from pathtracing_tpu.parallel.sharding import make_sharded_render
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    print(f"topology {args.topology}: {len(topo.devices)} devices")
    mesh1 = Mesh(np.array(topo.devices[:1]), ("d",))
    sh = NamedSharding(mesh1, P())

    sg = load_golden(str(REPO / "tests/golden/scene.gold"))
    scene = scene_device_from_golden(sg)
    spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
    scene_specs = jax.tree.map(spec, scene)
    n = 1 << 15
    iv = jax.ShapeDtypeStruct((n,), jnp.int32, sharding=sh)
    fv = jax.ShapeDtypeStruct((n,), jnp.float32, sharding=sh)

    failures = 0

    def check(name, thunk):
        nonlocal failures
        try:
            c = thunk()
            ma = c.memory_analysis()
            extra = (
                f" temp={ma.temp_size_in_bytes/1e6:.1f}MB"
                if ma is not None
                else ""
            )
            print(f"  {name}: COMPILES{extra}")
            return c
        except Exception as e:
            failures += 1
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}")
            return None

    check(
        "integrator (scan)",
        lambda: jax.jit(
            functools.partial(path_trace_samples, TESTING), out_shardings=sh
        ).lower(scene_specs, iv, iv, iv).compile(),
    )
    check(
        "wavefront renderer",
        lambda: jax.jit(
            functools.partial(path_trace_wavefront, TESTING, spp=8),
            static_argnames=("spp",),
            out_shardings=sh,
        ).lower(scene_specs, iv, iv).compile(),
    )

    check(
        "wavefront stats (adaptive pass 1)",
        lambda: jax.jit(
            functools.partial(
                path_trace_wavefront, TESTING, spp=8, with_stats=True
            ),
            static_argnames=("spp", "with_stats"),
            out_shardings=sh,
        ).lower(scene_specs, iv, iv).compile(),
    )

    def _aov_thunk():
        from pathtracing_tpu.aov import _aov_tile

        return _aov_tile.lower(TESTING, scene_specs, iv, iv, 8).compile()

    check("aov tile", _aov_thunk)

    def _denoise_thunk():
        from pathtracing_tpu.denoise import _denoise

        hw = jax.ShapeDtypeStruct((256, 512), jnp.float32, sharding=sh)
        hw3 = jax.ShapeDtypeStruct((256, 512, 3), jnp.float32, sharding=sh)
        sc = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh)
        return _denoise.lower(
            hw3, (hw3, hw3, hw, hw), hw, 2, (sc,) * 5
        ).compile()

    check("denoiser (joint bilateral)", _denoise_thunk)

    ctrav = check(
        "traversal ray_query",
        lambda: jax.jit(
            lambda sc, ox, oy, oz, dx, dy, dz: ray_query(
                sc,
                jnp.full(n, int(sg["tlas"][0]), jnp.int32),
                jnp.full(n, int(sg["tlas"][1]), jnp.int32),
                Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                0.0, 1e9, jnp.ones(n, bool),
            )[0].thit,
            out_shardings=sh,
        ).lower(scene_specs, fv, fv, fv, fv, fv, fv).compile(),
    )
    if ctrav is not None and args.dump_hlo:
        out = pathlib.Path(args.dump_hlo) / "traversal_v5e.hlo"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(ctrav.as_text())
        print(f"  (optimized HLO -> {out})")

    # tuning-knob combos: every schedule the tuning table may select must
    # lower for the real TPU target (they are only CPU-tested in CI)
    for le, mid, unr in ((8, False, True), (16, True, True), (16, True, False)):
        check(
            f"traversal K={le} mid={int(mid)} unroll={int(unr)}",
            lambda le=le, mid=mid, unr=unr: jax.jit(
                lambda sc, ox, oy, oz, dx, dy, dz: ray_query(
                    sc,
                    jnp.full(n, int(sg["tlas"][0]), jnp.int32),
                    jnp.full(n, int(sg["tlas"][1]), jnp.int32),
                    Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                    0.0, 1e9, jnp.ones(n, bool),
                    leaf_every=le, mid_entry=mid, unroll=unr,
                )[0].thit,
                out_shardings=sh,
            ).lower(scene_specs, fv, fv, fv, fv, fv, fv).compile(),
        )

    # multi-chip sharded render over the full topology
    n_dev = len(topo.devices)
    meshN = Mesh(np.array(topo.devices).reshape(n_dev // 2, 2), ("tiles", "samples"))
    npix = (n_dev // 2) * (1 << 14)
    shp = NamedSharding(meshN, P(("tiles",)))
    shr = NamedSharding(meshN, P())
    scene_specsN = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shr), scene
    )
    ip = jax.ShapeDtypeStruct((npix,), jnp.int32, sharding=shp)
    for wavefront in (False, True):
        check(
            f"sharded {n_dev}-chip wavefront={wavefront}",
            lambda wf=wavefront: make_sharded_render(
                TESTING, meshN, spp=16, wavefront=wf
            ).lower(scene_specsN, ip, ip).compile(),
        )

    # distributed training step: sharded forward + remat backward + psum
    # gradient all-reduce over both mesh axes
    from pathtracing_tpu.parallel.sharding import make_sharded_render_grad

    check(
        f"sharded {n_dev}-chip training step",
        lambda: make_sharded_render_grad(TESTING, meshN, spp=16)
        .lower(scene_specsN, ip, ip)
        .compile(),
    )

    # geometry sharding (TP analogue): per-shard compact tables, pmin/psum
    # closest-hit combine, composed with pixel tiles
    def _geom_thunk():
        from pathtracing_tpu import models
        from pathtracing_tpu.parallel.geomshard import (
            build_shard_scenes,
            make_geom_sharded_render,
        )

        host, _ = models.build("sphere_ground", TESTING)
        gmesh = Mesh(
            np.array(topo.devices).reshape(2, n_dev // 2), ("geom", "tiles")
        )
        stacked, _ = build_shard_scenes(host, TESTING, 2)
        shg = NamedSharding(gmesh, P("geom"))
        shp_g = NamedSharding(gmesh, P("tiles"))
        stacked_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shg),
            stacked,
        )
        gp = jax.ShapeDtypeStruct(((n_dev // 2) * (1 << 13),), jnp.int32,
                                  sharding=shp_g)
        return (
            make_geom_sharded_render(TESTING, gmesh, spp=4, tile_axis="tiles")
            .lower(stacked_specs, gp, gp)
            .compile()
        )

    check(f"geom-sharded 2x{n_dev // 2} render", _geom_thunk)

    # Pallas Mosaic lowering — documented-expected failure on current Mosaic
    from pathtracing_tpu.ops.pallas_traversal import ray_query_pallas

    try:
        jax.jit(
            lambda sc, ox, oy, oz, dx, dy, dz: ray_query_pallas(
                sc,
                jnp.full(n, int(sg["tlas"][0]), jnp.int32),
                jnp.full(n, int(sg["tlas"][1]), jnp.int32),
                Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                0.0, 1e9, jnp.ones(n, bool), interpret=False,
            )[0].thit,
            out_shardings=sh,
        ).lower(scene_specs, fv, fv, fv, fv, fv, fv)
        print("  pallas Mosaic lowering: LOWERS (Mosaic gained gather support!"
              " — re-evaluate the VMEM-resident kernel)")
    except Exception as e:
        print(f"  pallas Mosaic lowering: fails as documented"
              f" ({type(e).__name__}: {str(e)[:80]})")

    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
