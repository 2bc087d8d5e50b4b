"""Incremental wide packing (scene/device.DevicePacker wide=True).

The animated frame loop's fast path: the static BLAS wide region is built
once, each frame appends only instance rows + the subframe-TLAS wide tail
(accel/wide.build_frame_tail). Hits through the incrementally packed tables
must be IDENTICAL to the one-shot pack_scene(wide=True) tables (same rows,
different order — cursors are absolute), and repacking after an instance
move must keep every device shape stable (bucketed tails: one compiled
kernel serves all 1800 frames; reference frame loop: scene.cc:271-718,
main.cc:74-105).
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.accel.builder_py import build_tlas
from pathtracing_tpu.config import TESTING
from pathtracing_tpu.ops.wide_traversal import wide_ray_query
from pathtracing_tpu.scene.device import DevicePacker, pack_scene
from pathtracing_tpu.scene.types import Subframe, TlasInstance
from pathtracing_tpu.utils.vec import Vec3

from conftest import ASSET_DIR, REFERENCE_DATA
from golden_scene import build_golden_scene_host, make_transform


@pytest.fixture(scope="module")
def host_scene():
    ground = ASSET_DIR / "golden" / "ground.obj"
    if not ground.exists() or not (REFERENCE_DATA / "teapot.obj").exists():
        pytest.skip("assets unavailable")
    return build_golden_scene_host(str(REFERENCE_DATA), str(ground))


def _pack_oneshot(s, wide=True):
    return pack_scene(
        s.mesh_buf.arrays(), s.bvh_buf.nodes, s.bvh_buf.links,
        s.instances, s.subframes, wide=wide,
    )


def _probe_rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    org[:, 1] = rng.uniform(0.2, 9.0, n).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, d


def _query(scene, sf, org, d, anyhit=False):
    R = len(org)
    tlc = jnp.full(R, sf.tlas.node_count, jnp.int32)
    tlo = jnp.full(R, sf.tlas.node_offset, jnp.int32)
    o = Vec3(*(jnp.asarray(org[:, i]) for i in range(3)))
    dd = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    hit, occ = jax.jit(
        lambda o_, d_: wide_ray_query(
            scene, tlc, tlo, o_, d_, 1e-4, 1e9, act, anyhit=anyhit
        )
    )(o, dd)
    return hit, occ


def _assert_same_hits(ha, hb):
    np.testing.assert_array_equal(np.asarray(ha.inst), np.asarray(hb.inst))
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))
    np.testing.assert_array_equal(np.asarray(ha.thit), np.asarray(hb.thit))


def test_incremental_matches_oneshot(host_scene):
    s = host_scene
    oneshot = _pack_oneshot(s)
    packer = DevicePacker(s, wide=True)
    inc = packer.pack_frame(s)
    assert inc.wide_rows is not None and inc.tri_shade is not None

    org, d = _probe_rays()
    sf = s.subframes[0]
    h1, _ = _query(oneshot, sf, org, d)
    h2, _ = _query(inc, sf, org, d)
    _assert_same_hits(h1, h2)
    _, o1 = _query(oneshot, sf, org, d, anyhit=True)
    _, o2 = _query(inc, sf, org, d, anyhit=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_repack_after_instance_move_is_shape_stable(host_scene):
    s = copy.deepcopy(host_scene)
    packer = DevicePacker(s, wide=True)
    dev0 = packer.pack_frame(s)
    shapes0 = jax.tree.map(lambda a: a.shape, dev0)

    # "next frame": move the teapot, drop a rock, rebuild the TLAS tail —
    # the same churn setup_animation_frame applies (scene.cc:271-718)
    s.bvh_buf.pop(s.subframes[0].tlas)
    m, blas = s.meshes["teapot"]
    s.instances[1] = TlasInstance.create(
        blas, m, make_transform((0.5, 0.25, -0.5), (0, 75, 0), (1, 1, 1))
    )
    del s.instances[-1]
    tlas = build_tlas(
        s.instances, list(range(len(s.instances))), s.bvh_buf.nodes, s.bvh_buf
    )
    s.subframes = [
        Subframe(tlas, sf.cam, sf.light) for sf in s.subframes
    ]
    dev1 = packer.pack_frame(s)
    shapes1 = jax.tree.map(lambda a: a.shape, dev1)
    assert shapes0 == shapes1, "frame repack changed device shapes"

    # and the repacked tables still match a one-shot pack of the new state
    oneshot = _pack_oneshot(s)
    org, d = _probe_rays(seed=1)
    sf = s.subframes[0]
    h1, _ = _query(oneshot, sf, org, d)
    h2, _ = _query(dev1, sf, org, d)
    _assert_same_hits(h1, h2)


def test_megakernel_through_packer(host_scene):
    """End-to-end: the frame-loop tables drive the megakernel and match the
    one-shot wide render lane-for-lane."""
    from pathtracing_tpu.render import render_pixels

    s = host_scene
    inc = DevicePacker(s, wide=True).pack_frame(s)
    oneshot = _pack_oneshot(s)

    W = TESTING.image_width
    n = 2 * W  # two full rows: row-major [0, N) as the megakernel requires
    xs = np.arange(n, dtype=np.int32) % W
    ys = np.arange(n, dtype=np.int32) // W
    a = render_pixels(TESTING, oneshot, xs, ys, spp=2, megakernel=True)
    b = render_pixels(TESTING, inc, xs, ys, spp=2, megakernel=True)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_concat_rows_bitsafe_preserves_subnormal_patterns():
    """The per-frame table concat must preserve uint32 link bit patterns
    EXACTLY. XLA:TPU's big-buffer f32 concatenate flushes subnormals (the
    round-3 frame-loop corruption, BENCH_NOTES), so the concat runs in
    int32 space; this pins the bit-exactness contract on every backend."""
    import jax.numpy as jnp

    from pathtracing_tpu.scene.device import _concat_rows_bitsafe

    pat = np.array(
        [[0x0037EB38, 0x803649D0, 0xC0000000, 0x00000001,
          0x7F800000, 0x00000000, 0x80000000, 0x3F800000]], np.uint32
    )
    static = np.tile(pat, (700, 1)).view(np.float32)
    tail = np.tile(pat[:, ::-1], (300, 1)).view(np.float32)
    out = np.asarray(
        _concat_rows_bitsafe(jnp.asarray(static), tail)
    ).view(np.uint32)
    np.testing.assert_array_equal(out[:700], static.view(np.uint32))
    np.testing.assert_array_equal(out[700:], tail.view(np.uint32))


def test_mk_dispatch_chunking_scene_aware():
    """Large scenes get a smaller per-dispatch sample cap (their samples
    run ~10x slower; a multi-minute dispatch gets the TPU worker killed)."""
    from pathtracing_tpu.ops.traversal import LARGE_SCENE_NODES
    from pathtracing_tpu.render import (
        DEFAULT_MK_DISPATCH_SAMPLES,
        DEFAULT_MK_DISPATCH_SAMPLES_LARGE,
        _mk_spp_chunk,
    )

    class _S:
        def __init__(self, n_nodes):
            self.nl8 = np.zeros((8 * n_nodes, 8), np.float32)

    n_pixels = 1 << 20
    small = _mk_spp_chunk(n_pixels, 1024, _S(100))
    large = _mk_spp_chunk(n_pixels, 1024, _S(LARGE_SCENE_NODES + 1))
    assert small * n_pixels <= DEFAULT_MK_DISPATCH_SAMPLES
    assert large * n_pixels <= DEFAULT_MK_DISPATCH_SAMPLES_LARGE
    assert large < small
    assert 1024 % small == 0 and 1024 % large == 0
