#!/usr/bin/env python3
"""Benchmark: golden-scene render throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference C++ renderer (OpenMP, this machine's CPU,
compiled -O2 -fopenmp) renders the identical golden scene at
640x360 @ 8 spp in 1.35 s => 1.36 Msamples/s (measured 2026-08-17 via
tools/oracle/harness render; reference hot loop = main.cc:16-44).
Re-measured 2026-08-20: 1.15 Msamples/s @ 8 spp, 1.23 @ 32 spp — the
reference's per-sample rate is spp-invariant, so the BEST-EVER 1.36
anchor is kept (conservative for us) while the bench renders at 32 spp,
closer to the production 256-1024 spp regime where fixed per-dispatch
costs amortize.
"""

from __future__ import annotations

import json
import sys
import time
import pathlib

import numpy as np

_REPO = pathlib.Path(__file__).parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

CPU_BASELINE_MSAMPLES_S = 1.36


def _tpu_alive(timeout_s: int = 180) -> bool:
    """Probe the TPU in a subprocess (a wedged axon tunnel hangs forever)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jnp.arange(4.0).sum().block_until_ready()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    cpu_fallback = not _tpu_alive()
    if cpu_fallback:
        # CPU fallback: shard over virtual host devices so the bench still
        # reports the framework's parallel path (the TPU tunnel can wedge
        # for hours; see CLAUDE.md).
        n_dev = min(os.cpu_count() or 8, 16)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.render import render_pixels
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    # wide=True attaches the mega-table traversal (accel/wide.py) — the
    # TPU-native fast path, bit-identical results; PT_WIDE=0 reverts to the
    # binary octant-link walk for A/B.
    from pathtracing_tpu.tuning import get_tuning

    wl = os.environ.get("PT_WIDE_LAYOUT") or str(
        get_tuning("tpu", "small").get("wide_layout", "w8")
    )
    scene = scene_device_from_golden(
        load_golden(str(_REPO / "tests" / "golden" / "scene.gold")),
        wide=os.environ.get("PT_WIDE", "1") == "1",
        leaf_bundle=None,
        wide_layout=wl,
    )

    # tuning knobs (results are bit-identical under all of these; see
    # ops/traversal.py docstrings) so a TPU measurement session can A/B
    # without code edits: PT_LEAF_EVERY=<int|none>, PT_COMPACT_SCHEDULE=
    # "32:4,16:2", PT_BF16_NODES=1, PT_MID_ENTRY=1, PT_UNROLL=1,
    # PT_TILE=<pixels per wavefront tile; default 32768>
    from pathtracing_tpu.ops import traversal as _trav

    v = os.environ.get("PT_LEAF_EVERY")
    if v:
        _trav.DEFAULT_LEAF_EVERY = None if v == "none" else int(v)
    v = os.environ.get("PT_COMPACT_SCHEDULE")
    if v:
        _trav.DEFAULT_COMPACT_SCHEDULE = tuple(
            (int(a), int(b))
            for a, b in (stage.split(":") for stage in v.split(","))
        )
    v = os.environ.get("PT_MID_ENTRY")
    if v:
        _trav.DEFAULT_MID_ENTRY = v == "1"
    v = os.environ.get("PT_UNROLL")
    if v:
        _trav.DEFAULT_UNROLL = v == "1"
    if os.environ.get("PT_BF16_NODES") == "1":
        from pathtracing_tpu.scene.device import with_bf16_nodes

        scene = with_bf16_nodes(scene)
    from pathtracing_tpu.render import default_tile_pixels
    from pathtracing_tpu import render as _render

    v = os.environ.get("PT_TILE")
    tile_pixels = int(v) if v else default_tile_pixels(scene)
    # megakernel knobs: PT_MK=0 disables the persistent-lane megakernel
    # (auto-selected on TPU when the scene has wide tables);
    # PT_MK_LANES / PT_MK_LEAF override the tuning-table optima.
    mk = None if os.environ.get("PT_MK", "1") == "1" else False
    v = os.environ.get("PT_MK_LANES")
    if v:
        _render.DEFAULT_MK_LANES = int(v)
    v = os.environ.get("PT_MK_LEAF")
    if v:
        _render.DEFAULT_MK_LEAF = int(v)
    v = os.environ.get("PT_MK_SERVICE")
    if v:
        _render.DEFAULT_MK_SERVICE = int(v)

    W, H = TESTING.image_width, TESTING.image_height
    spp = int(os.environ.get("PT_BENCH_SPP", "32"))
    idx = np.arange(W * H, dtype=np.int32)
    xs, ys = idx % W, idx // W

    if cpu_fallback:
        import jax

        from pathtracing_tpu.parallel.sharding import (
            make_mesh,
            render_frame_sharded,
        )

        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, 1)
        render_frame_sharded(TESTING, scene, mesh, spp=1, wavefront=True)  # warmup
        t0 = time.perf_counter()
        colors = render_frame_sharded(TESTING, scene, mesh, spp=spp, wavefront=True)
        dt = time.perf_counter() - t0
        assert np.isfinite(colors).all()
        msamples_s = W * H * spp / dt / 1e6
        print(
            json.dumps(
                {
                    "metric": "golden_scene_render_throughput",
                    "value": round(msamples_s, 4),
                    "unit": "Msamples/s",
                    "vs_baseline": round(msamples_s / CPU_BASELINE_MSAMPLES_S, 4),
                    "device": "cpu-fallback (axon tunnel down)",
                }
            )
        )
        return

    # warmup/compile: identical statics to the timed call (the megakernel
    # compiles per (n_pixels, spp, lanes, leaf), so a tile-sized warmup
    # would leave the real kernel cold)
    render_pixels(TESTING, scene, xs, ys, spp=spp,
                  tile_pixels=tile_pixels, wavefront=True, megakernel=mk)

    t0 = time.perf_counter()
    colors = render_pixels(TESTING, scene, xs, ys, spp=spp,
                           tile_pixels=tile_pixels, wavefront=True,
                           megakernel=mk)
    dt = time.perf_counter() - t0
    assert np.isfinite(colors).all()

    msamples_s = W * H * spp / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "golden_scene_render_throughput",
                "value": round(msamples_s, 4),
                "unit": "Msamples/s",
                "vs_baseline": round(msamples_s / CPU_BASELINE_MSAMPLES_S, 4),
                "device": "tpu",
            }
        )
    )


if __name__ == "__main__":
    main()
