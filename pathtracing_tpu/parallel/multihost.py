"""Multi-host pod-slice rendering.

The reference has no distributed layer at all (SURVEY.md §2.11); this is the
TPU-native one: ``jax.distributed.initialize`` per host, a global
``("hosts", "tiles", "samples")`` mesh whose host axis shards frame rows
over DCN while tiles/samples shard over ICI inside each slice, and
host-local output assembly (each host writes its own row block; frame files
compose without communication — the renderer's all_gather is the
filesystem).

Frames themselves are embarrassingly parallel (the intended cluster-scale
answer for the reference's course, SURVEY.md §2.11), so the coarsest and
most effective distribution is frames round-robined over hosts —
``frames_for_host`` below; the in-frame mesh path exists for latency-bound
single-frame work.

Cannot be exercised on this 1-chip dev box beyond mesh construction; the
sharded compute path itself is CPU-mesh tested in tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import numpy as np

from pathtracing_tpu.config import RenderConfig


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime (idempotent).

    With no arguments, relies on the TPU pod metadata environment the way
    jax.distributed does natively.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def frames_for_host(
    begin: int, end: int, process_id: int | None = None, n_hosts: int | None = None
) -> list[int]:
    """Round-robin frame assignment — the DCN-free distribution."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if n_hosts is None else n_hosts
    return [f for f in range(begin, end) if f % n == pid]


def local_device_mesh(n_samples: int = 1):
    """A (tiles, samples) mesh over this host's local devices."""
    from pathtracing_tpu.parallel.sharding import make_mesh

    local = jax.local_devices()
    n_tiles = max(len(local) // n_samples, 1)
    return make_mesh(n_tiles, n_samples, local[: n_tiles * n_samples])


def render_frames_distributed(
    config: RenderConfig,
    scene_factory,
    begin: int,
    end: int,
    out_dir: str,
    spp: int | None = None,
):
    """Render [begin, end) with frames round-robined across hosts and each
    frame sharded over this host's local devices.

    scene_factory(frame_index) -> SceneDevice for that frame.
    """
    import os

    from pathtracing_tpu.io.bmp import write_bmp
    from pathtracing_tpu.ops.tonemap import tonemap
    from pathtracing_tpu.parallel.sharding import render_frame_sharded
    from pathtracing_tpu.utils.vec import Vec3
    import jax.numpy as jnp

    mesh = local_device_mesh()
    for frame_index in frames_for_host(begin, end):
        scene = scene_factory(frame_index)
        colors = render_frame_sharded(config, scene, mesh, spp)
        b, g, r, a = jax.jit(tonemap)(
            Vec3(*(jnp.asarray(colors[..., i]) for i in range(3)))
        )
        image = np.stack(
            [np.asarray(b), np.asarray(g), np.asarray(r), np.asarray(a)], -1
        )
        write_bmp(
            os.path.join(out_dir, f"frame_{frame_index:04d}.bmp"), image
        )
