"""Multi-chip sharding of the render loop.

The reference's only parallelism is one OpenMP loop over pixels
(reference: main.cc:16). The TPU-native decomposition is two mesh axes:

  * ``tiles``  — data parallelism over pixels: each device owns a disjoint
    slice of the flat pixel list. No communication.
  * ``samples`` — sample-axis parallelism: each device renders a disjoint
    ``sample_index`` range of the *same* pixels and partial radiance is
    reduced with ``psum``. Valid because the RNG seed depends only on
    (x, y, sample_index, student_id) (reference: path_tracer.hh:659), so
    sample ranges can be rendered anywhere and summed — the renderer's
    gradient-accumulation analogue (SURVEY.md §5).

The scene (BVH + mesh tables) is replicated on every device; subframe TLAS
tables are small and ride along.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import path_trace_samples


def make_mesh(n_tiles: int, n_samples: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_tiles * n_samples
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_tiles, n_samples)
    return Mesh(dev, ("tiles", "samples"))


def make_sharded_render(
    config: RenderConfig, mesh: Mesh, spp: int, wavefront: bool = False
):
    """Returns a jitted fn(scene, xs, ys) -> (r, g, b) per-pixel radiance sums.

    xs/ys are flat pixel arrays sharded over the ``tiles`` axis; every
    device in a ``samples`` column computes its slice of the spp range and
    the column is psum-reduced. wavefront=True uses the path-regeneration
    kernel (ops/wavefront.py) for the local sample range.
    """
    n_sample_shards = mesh.shape["samples"]
    assert spp % n_sample_shards == 0, (spp, n_sample_shards)
    local_spp = spp // n_sample_shards

    def local_render(scene, xs, ys):
        shard = jax.lax.axis_index("samples")
        base = shard.astype(jnp.int32) * local_spp

        if wavefront:
            from pathtracing_tpu.ops.wavefront import path_trace_wavefront

            acc = path_trace_wavefront(
                config, scene, xs, ys, local_spp, sample_base=base
            )
            r, g, b = acc.x, acc.y, acc.z
        else:
            def body(acc, s):
                si = jnp.full(xs.shape, base + s, jnp.int32)
                c = path_trace_samples(config, scene, xs, ys, si)
                return (acc[0] + c.x, acc[1] + c.y, acc[2] + c.z), None

            zero = jnp.zeros(xs.shape, jnp.float32)
            (r, g, b), _ = jax.lax.scan(
                body, (zero, zero, zero), jnp.arange(local_spp, dtype=jnp.int32)
            )
        # reduce the sample axis (ICI all-reduce)
        r = jax.lax.psum(r, "samples")
        g = jax.lax.psum(g, "samples")
        b = jax.lax.psum(b, "samples")
        return r, g, b

    shard_fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P("tiles"), P("tiles")),
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_render_megakernel(
    config: RenderConfig,
    mesh: Mesh,
    n_pixels: int,
    spp: int,
    lanes: int = 8192,
    leaf_every: int = 4,
    service_div: int | None = None,
):
    """Sharded persistent-lane megakernel (the TPU fast path, multi-chip):
    jitted fn(scene) -> (r, g, b) per-pixel radiance sums for the row-major
    pixels [0, n_pixels).

    Decomposition mirrors make_sharded_render: the ``tiles`` axis owns
    disjoint contiguous pixel blocks (each device runs its own megakernel
    over its block via ``pixel_base`` — no communication), the ``samples``
    axis owns disjoint sample ranges of the same block, psum-reduced. The
    wide mega-table is replicated.
    """
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    n_tiles = mesh.shape["tiles"]
    n_sample_shards = mesh.shape["samples"]
    assert spp % n_sample_shards == 0, (spp, n_sample_shards)
    assert n_pixels % n_tiles == 0, (n_pixels, n_tiles)
    local_spp = spp // n_sample_shards
    local_pixels = n_pixels // n_tiles

    def local_render(scene):
        tile = jax.lax.axis_index("tiles").astype(jnp.int32)
        shard = jax.lax.axis_index("samples").astype(jnp.int32)
        acc = path_trace_megakernel(
            config, scene, local_pixels, local_spp,
            sample_base=shard * local_spp,
            lanes=lanes, leaf_every=leaf_every, service_div=service_div,
            pixel_base=tile * local_pixels,
        )
        r = jax.lax.psum(acc.x, "samples")
        g = jax.lax.psum(acc.y, "samples")
        b = jax.lax.psum(acc.z, "samples")
        return r, g, b

    shard_fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P("tiles"),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_render_grad(
    config: RenderConfig,
    mesh: Mesh,
    spp: int,
    fields=None,
    loss_fn=None,
    remat: bool = True,
):
    """The renderer's distributed *training step*: jitted
    fn(scene, xs, ys) -> (loss, grads).

    Forward is sharded exactly like make_sharded_render (pixels over
    ``tiles``, sample ranges over ``samples``); backward runs locally and
    the per-field cotangents are ``psum``-reduced over BOTH axes — the
    data-parallel gradient all-reduce, riding ICI. The loss is the global
    mean lane-sample value of ``loss_fn`` (default luminance), so the
    result is independent of the mesh shape.

    remat=True wraps the per-sample render in ``jax.checkpoint``: backward
    recomputes each sample's forward instead of storing residuals for the
    whole sample range, making gradient memory O(1) in spp.
    """
    from pathtracing_tpu.diff.render import DIFFERENTIABLE_FIELDS

    fields = tuple(fields) if fields is not None else DIFFERENTIABLE_FIELDS
    if loss_fn is None:
        def loss_fn(c):
            return jnp.sum(0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z)

    n_tiles = mesh.shape["tiles"]
    n_sample_shards = mesh.shape["samples"]
    assert spp % n_sample_shards == 0, (spp, n_sample_shards)
    local_spp = spp // n_sample_shards

    def local_step(scene, xs, ys):
        shard = jax.lax.axis_index("samples")
        base = shard.astype(jnp.int32) * local_spp
        denom = jnp.float32(xs.shape[0] * n_tiles * spp)

        def sample_loss(params, s):
            sc = scene._replace(**params)
            si = jnp.full(xs.shape, base + s, jnp.int32)
            c = path_trace_samples(config, sc, xs, ys, si)
            return loss_fn(c) / denom

        if remat:
            sample_loss = jax.checkpoint(sample_loss)

        def forward(params):
            def body(acc, s):
                return acc + sample_loss(params, s), None

            total, _ = jax.lax.scan(
                body,
                jnp.float32(0.0),
                jnp.arange(local_spp, dtype=jnp.int32),
            )
            return total

        params = {f: getattr(scene, f) for f in fields}
        loss, grads = jax.value_and_grad(forward)(params)
        loss = jax.lax.psum(loss, ("tiles", "samples"))
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("tiles", "samples")), grads
        )
        return loss, grads

    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("tiles"), P("tiles")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def make_sharded_fast_grad_frame(
    config: RenderConfig,
    mesh: Mesh,
    n_pixels: int,
    spp: int,
    fields=None,
    loss_fn=None,
    lanes: int = 8192,
):
    """The FAST gradient protocol, multi-chip: jitted fn(scene) ->
    (loss, grads) over the row-major frame pixels [0, n_pixels) x samples
    [0, spp).

    Per device: megakernel RECORD pass over its (tile pixel-block x
    sample-range) shard, then the traversal-free replay value_and_grad
    (diff/render.make_fast_grad_frame_fn semantics, reference forward:
    path_tracer.hh:637-741 — gradients are the framework extension).
    Loss is the global mean lane-sample luminance; per-field cotangents
    psum over BOTH axes — the DP gradient all-reduce riding ICI
    (SURVEY.md §2.11). Equality vs the single-device fast grad:
    tests/test_parallel.py::test_sharded_fast_grad_matches.
    """
    from pathtracing_tpu.diff.render import DIFFERENTIABLE_FIELDS
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    fields = tuple(fields) if fields is not None else DIFFERENTIABLE_FIELDS
    if loss_fn is None:
        def loss_fn(c):
            return jnp.sum(0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z)

    n_tiles = mesh.shape["tiles"]
    n_sample_shards = mesh.shape["samples"]
    assert spp % n_sample_shards == 0, (spp, n_sample_shards)
    assert n_pixels % n_tiles == 0, (n_pixels, n_tiles)
    local_spp = spp // n_sample_shards
    local_pixels = n_pixels // n_tiles
    n_items = local_pixels * local_spp
    item = np.arange(n_items, dtype=np.int32)

    def local_step(scene):
        tile = jax.lax.axis_index("tiles").astype(jnp.int32)
        shard = jax.lax.axis_index("samples").astype(jnp.int32)
        pixel_base = tile * local_pixels
        sample_base = shard * local_spp
        pix = pixel_base + jnp.asarray(item) % local_pixels
        xs = pix % config.image_width
        ys = pix // config.image_width
        si = sample_base + jnp.asarray(item) // local_pixels
        denom = jnp.float32(n_pixels * spp)

        sg = jax.tree.map(jax.lax.stop_gradient, scene)
        _, records = path_trace_megakernel(
            config, sg, local_pixels, local_spp, sample_base,
            lanes=lanes, record=True, pixel_base=pixel_base,
        )

        def forward(params):
            s = scene._replace(**params)
            c = path_trace_samples(config, s, xs, ys, si, replay=records)
            return loss_fn(c) / denom

        params = {f: getattr(scene, f) for f in fields}
        loss, grads = jax.value_and_grad(forward)(params)
        loss = jax.lax.psum(loss, ("tiles", "samples"))
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("tiles", "samples")), grads
        )
        return loss, grads

    shard_fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)


def render_frame_sharded(
    config: RenderConfig,
    scene,
    mesh: Mesh,
    spp: int | None = None,
    wavefront: bool = False,
):
    """Full-frame render across the mesh; returns (H, W, 3) averaged f32."""
    spp = spp or config.samples_per_pixel
    W, H = config.image_width, config.image_height
    n_tiles = mesh.shape["tiles"]
    idx = np.arange(W * H, dtype=np.int32)
    pad = (-len(idx)) % n_tiles
    idx = np.concatenate([idx, np.zeros(pad, np.int32)])
    xs = jnp.asarray(idx % W, jnp.int32)
    ys = jnp.asarray(idx // W, jnp.int32)
    fn = make_sharded_render(config, mesh, spp, wavefront=wavefront)
    r, g, b = fn(scene, xs, ys)
    colors = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
    colors = colors[: W * H] / np.float32(spp)
    return colors.reshape(H, W, 3)
