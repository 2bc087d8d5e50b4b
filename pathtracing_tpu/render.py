"""Frame rendering driver.

The reference's ``baseline_render`` is a flat OpenMP loop over pixels with a
serial sample loop per pixel (reference: main.cc:12-46). Here a frame is a
grid of flat pixel tiles; each tile renders as a wavefront of
``tile_pixels`` lanes with samples accumulated by a ``lax.scan`` over sample
batches — one compiled kernel, reused for every tile and every frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.ops.tonemap import tonemap
from pathtracing_tpu.utils.vec import Vec3


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _render_tile_wavefront(
    config: RenderConfig, scene, xs, ys, spp: int, sample_base: int = 0
):
    """Wavefront-with-regeneration tile kernel (ops/wavefront.py): ~100%
    lane occupancy across bounces instead of the scan's masked dead lanes."""
    from pathtracing_tpu.ops.wavefront import path_trace_wavefront

    acc = path_trace_wavefront(config, scene, xs, ys, spp, sample_base)
    return acc.x, acc.y, acc.z


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 5, 6, 7, 9))
def _render_frame_megakernel(
    config: RenderConfig, scene, n_pixels: int, spp: int, sample_base,
    lanes: int, leaf_every: int, service_div: int, pixel_order=None,
    hot_k: int | None = None,
):
    """Persistent-lane megakernel (ops/megakernel.py): one while_loop renders
    the whole frame — no per-bounce drains, no compaction permutes."""
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    acc, n_truncated = path_trace_megakernel(
        config, scene, n_pixels, spp, sample_base, lanes=lanes,
        leaf_every=leaf_every, service_div=service_div,
        return_truncated=True, pixel_order=pixel_order, hot_k=hot_k,
    )
    return acc.x, acc.y, acc.z, n_truncated


# Morton lane order (PT_MK_MORTON=1 to enable): item slots cover the
# frame in Z-curve order. MEASURED 3.5x SLOWER on the v5e at frame 900
# (0.046 vs 0.160 Msamples/s): heavily-duplicated gather indices
# serialize (bank conflicts), they are not cached — the scanline order's
# mild spread is already on the fast side of the gather engine. Kept for
# re-evaluation on other topologies; default OFF.
@functools.lru_cache(maxsize=4)
def _morton_order_cached(n_pixels: int, width: int):
    import os

    if os.environ.get("PT_MK_MORTON", "0") == "0":
        return None
    if n_pixels % width:
        return None
    from pathtracing_tpu.ops.megakernel import morton_pixel_order

    return jnp.asarray(morton_pixel_order(width, n_pixels // width))


def megakernel_supported(scene, xs, ys, width: int) -> bool:
    """The megakernel owns pixels [0, N) of a row-major frame and needs the
    wide tables (area-light NEE scenes included — ops/megakernel.py chains
    the extra shadow phase)."""
    if getattr(scene, "wide_rows", None) is None:
        return False
    n = len(xs)
    idx = np.arange(n, dtype=np.int64)
    return bool(
        np.array_equal(np.asarray(xs, np.int64), idx % width)
        and np.array_equal(np.asarray(ys, np.int64), idx // width)
    )


# module overrides for the megakernel knobs (None = use the tuning table);
# set by bench.py's PT_MK_LANES / PT_MK_LEAF env vars and perf tooling.
DEFAULT_MK_LANES: int | None = None
DEFAULT_MK_LEAF: int | None = None
DEFAULT_MK_SERVICE: int | None = None
# None = auto (DEFAULT_MK_HOT_K when the scene ships hot_rows, else 0)
DEFAULT_MK_HOT_K: int | None = None

# Megakernel dispatch budgets. The accumulator is per-PIXEL (the
# death-time scatter fold, ops/megakernel.py), so memory no longer scales
# with spp; the binding limit is per-dispatch WALL CLOCK — one while_loop
# execution that runs minutes of device time gets the axon worker killed
# ("TPU worker process crashed", observed at 236 Msamples/dispatch), and a
# production frame would be one 2.1-Gsample dispatch. Cap dispatches at
# ~32 Msamples (~15 s at 2.3 Msamples/s); partial sums add exactly
# (sample-range seeding contract). PT_MK_ACC_MB survives as the memory
# escape hatch.
DEFAULT_MK_ACC_MB = 25600
DEFAULT_MK_DISPATCH_SAMPLES = 32 << 20
# large scenes (deep forests, 100 MB+ tables) run ~10x fewer samples/s, so
# their dispatches must be proportionally smaller to stay under the
# worker's execution watchdog
DEFAULT_MK_DISPATCH_SAMPLES_LARGE = 4 << 20


def _mk_spp_chunk(
    n_pixels: int, spp: int, scene=None, bytes_per_pixel: int = 12
) -> int:
    """Largest per-dispatch spp within the memory + wall-clock budgets;
    prefers a divisor of spp so every dispatch reuses ONE compiled
    kernel. ``bytes_per_pixel`` is the accumulator footprint: 12 for the
    3 f32 radiance planes, 16 when the with_stats fold carries the 4th
    acc_l2 plane (adaptive._stats_pass)."""
    import os

    default_cap = DEFAULT_MK_DISPATCH_SAMPLES
    if scene is not None:
        from pathtracing_tpu.ops.traversal import LARGE_SCENE_NODES

        if (scene.nl8.shape[0] // 8) > LARGE_SCENE_NODES:
            default_cap = DEFAULT_MK_DISPATCH_SAMPLES_LARGE
    budget = int(os.environ.get("PT_MK_ACC_MB", DEFAULT_MK_ACC_MB)) << 20
    cap = int(os.environ.get("PT_MK_DISPATCH_SAMPLES", default_cap))
    limit = max(
        1, min(budget // (n_pixels * bytes_per_pixel), cap // n_pixels)
    )
    if spp <= limit:
        return spp
    for c in range(limit, 0, -1):
        if spp % c == 0:
            return c
    return limit


def default_mk_knobs(scene) -> tuple[int, int, int]:
    """Platform-resolved (mk_lanes, mk_leaf_every, mk_service_div) from the
    tuning table."""
    from pathtracing_tpu.ops.traversal import LARGE_SCENE_NODES
    from pathtracing_tpu.tuning import get_tuning

    large = (scene.nl8.shape[0] // 8) > LARGE_SCENE_NODES
    t = get_tuning(jax.default_backend(), "large" if large else "small")
    lanes = DEFAULT_MK_LANES or int(t["mk_lanes"])
    leaf = DEFAULT_MK_LEAF or int(t["mk_leaf_every"])
    sdiv = DEFAULT_MK_SERVICE or int(t.get("mk_service_div", 8))
    return lanes, leaf, sdiv


@functools.partial(jax.jit, static_argnums=(0, 4))
def _render_tile(config: RenderConfig, scene, xs, ys, spp: int, sample_base=0):
    """Sum `spp` samples per lane starting at sample_base; returns (r,g,b).

    Sample ranges are independent given the (x, y, sample_index) seeding
    (reference: path_tracer.hh:659), so partial ranges rendered anywhere —
    another device, another host, another run — sum to the full result.
    """

    def body(carry, sample_index):
        acc = carry
        si = jnp.full(xs.shape, sample_index, jnp.int32)
        c = path_trace_samples(config, scene, xs, ys, si)
        return (acc[0] + c.x, acc[1] + c.y, acc[2] + c.z), None

    zero = jnp.zeros(xs.shape, jnp.float32)
    (r, g, b), _ = jax.lax.scan(
        body,
        (zero, zero, zero),
        jnp.arange(spp, dtype=jnp.int32) + jnp.int32(sample_base),
    )
    return r, g, b


def default_tile_pixels(scene) -> int:
    """Platform-resolved wavefront tile size (pathtracing_tpu/tuning.py).

    CPU optimum is cache-bound (~32k pixels measured); TPU wants much
    larger tiles to amortize per-while-iteration dispatch and give
    compaction a bigger population.
    """
    from pathtracing_tpu.ops.traversal import LARGE_SCENE_NODES
    from pathtracing_tpu.tuning import get_tuning

    large = (scene.nl8.shape[0] // 8) > LARGE_SCENE_NODES
    return int(
        get_tuning(jax.default_backend(), "large" if large else "small")[
            "tile_pixels"
        ]
    )


def run_tiled(kernel, xs, ys, tile_pixels: int, n_channels: int):
    """Run a jitted per-lane kernel over a pixel list in fixed-size tiles.

    kernel(txs, tys) -> tuple of n_channels (tile_pixels,) arrays. Tiles are
    padded to tile_pixels so ONE compiled kernel serves every tile; all
    tiles are dispatched before any result is forced (async pipelining).
    Returns a list of n_channels (N,) float32 arrays.
    """
    n = len(xs)
    out = [np.empty(n, np.float32) for _ in range(n_channels)]
    pending = []
    for start in range(0, n, tile_pixels):
        end = min(start + tile_pixels, n)
        pad = tile_pixels - (end - start)
        txs = np.concatenate([xs[start:end], np.zeros(pad, np.int32)])
        tys = np.concatenate([ys[start:end], np.zeros(pad, np.int32)])
        res = kernel(
            jnp.asarray(txs, jnp.int32), jnp.asarray(tys, jnp.int32)
        )
        pending.append((start, end, res))
    for start, end, res in pending:
        for k in range(n_channels):
            out[k][start:end] = np.asarray(res[k])[: end - start]
    return out


def to_bgra(colors: np.ndarray) -> np.ndarray:
    """Tonemap (H, W, 3) radiance to the reference's uchar BGRA layout
    (reference: path_tracer.hh:753-771, main.cc:42-46)."""
    b, g, r, a = jax.jit(tonemap)(
        Vec3(
            jnp.asarray(colors[..., 0]),
            jnp.asarray(colors[..., 1]),
            jnp.asarray(colors[..., 2]),
        )
    )
    return np.stack(
        [np.asarray(b), np.asarray(g), np.asarray(r), np.asarray(a)], axis=-1
    )


def render_pixels(
    config: RenderConfig,
    scene,
    xs: np.ndarray,
    ys: np.ndarray,
    spp: int | None = None,
    tile_pixels: int | None = None,
    sample_base: int = 0,
    average: bool = True,
    wavefront: bool = False,
    megakernel: bool | None = None,
):
    """Radiance for an arbitrary pixel list. Returns (N, 3) f32.

    average=False returns raw sums over [sample_base, sample_base+spp) for
    sample-range checkpointing (partials merge by addition).
    wavefront=True uses the path-regeneration kernel (1.25x on CPU, see
    ops/wavefront.py); per-sample semantics are identical up to chaotic
    boundary paths, so checkpoint partials remain mergeable.
    megakernel=True uses the persistent-lane megakernel (TPU fast path,
    ops/megakernel.py; needs wide tables + a row-major [0, N) pixel list);
    None auto-selects it on TPU when supported.
    tile_pixels=None resolves per platform via the tuning table.
    """
    spp = spp or config.samples_per_pixel
    if megakernel is None:
        # auto-select on TPU only: CPU optima favor the drain wavefront,
        # and the CPU test matrix pins each renderer explicitly.
        megakernel = jax.default_backend() == "tpu" and megakernel_supported(
            scene, xs, ys, config.image_width
        )
    if megakernel:
        if not megakernel_supported(scene, xs, ys, config.image_width):
            raise ValueError(
                "megakernel needs wide tables and a row-major [0, N) "
                "pixel list"
            )
        n = len(xs)
        lanes, leaf, sdiv = default_mk_knobs(scene)
        out = np.zeros((n, 3), np.float32)
        # Chunk the sample range so no single dispatch runs minutes of
        # device time (the worker watchdog kills those — see
        # DEFAULT_MK_DISPATCH_SAMPLES); partial sums add exactly (the
        # sample-range seeding contract, reference: path_tracer.hh:659).
        # sample_base is TRACED, so every equal-sized chunk reuses one
        # compiled kernel.
        chunk = _mk_spp_chunk(n, spp, scene)
        order = _morton_order_cached(n, config.image_width)
        for a in range(0, spp, chunk):
            c = min(chunk, spp - a)
            r, g, b, n_trunc = _render_frame_megakernel(
                config, scene, n, c,
                jnp.int32(int(sample_base) + a), lanes, leaf, sdiv, order,
                DEFAULT_MK_HOT_K,
            )
            out[:, 0] += np.asarray(r)[:n]
            out[:, 1] += np.asarray(g)[:n]
            out[:, 2] += np.asarray(b)[:n]
            if int(n_trunc):
                raise RuntimeError(
                    f"megakernel safety cap abandoned {int(n_trunc)} "
                    f"lanes (samples [{int(sample_base)+a}, "
                    f"{int(sample_base)+a+c})): output would be darkened"
                )
        if average:
            return out / np.float32(spp)
        return out
    if tile_pixels is None:
        tile_pixels = default_tile_pixels(scene)
    if wavefront:
        kernel = lambda txs, tys: _render_tile_wavefront(
            config, scene, txs, tys, spp, int(sample_base)
        )
    else:
        kernel = lambda txs, tys: _render_tile(
            config, scene, txs, tys, spp, jnp.int32(sample_base)
        )
    r, g, b = run_tiled(kernel, xs, ys, tile_pixels, 3)
    out = np.stack([r, g, b], -1)
    if average:
        return out / np.float32(spp)
    return out


def render_frame(
    config: RenderConfig,
    scene,
    spp: int | None = None,
    tile_pixels: int | None = None,
    wavefront: bool = False,
):
    """Render a full frame; returns (colors (H,W,3) f32, image (H,W,4) u8 BGRA)."""
    W, H = config.image_width, config.image_height
    idx = np.arange(W * H, dtype=np.int32)
    xs = idx % W
    ys = idx // W
    colors = render_pixels(
        config, scene, xs, ys, spp, tile_pixels, wavefront=wavefront
    ).reshape(H, W, 3)
    return colors, to_bgra(colors)
