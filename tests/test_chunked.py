"""Chunked static region (accel/chunks.py): instance-split wide tables.

The chunked packer re-expresses static instances as per-chunk INST rows
under one load-time static TLAS; per-frame tails carry only the dynamic
instances, exit-chained into the static root. Hits must match the plain
wide tables (same candidate set, traversal order may differ only on
exact-t ties — none occur on these probe sets), and any-hit occlusion
must be boolean-identical.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.ops.wide_traversal import wide_ray_query
from pathtracing_tpu.scene.device import DevicePacker
from pathtracing_tpu.utils.vec import Vec3

from conftest import ASSET_DIR, REFERENCE_DATA
from golden_scene import build_golden_scene_host


@pytest.fixture(scope="module")
def host_scene():
    ground = ASSET_DIR / "golden" / "ground.obj"
    if not ground.exists() or not (REFERENCE_DATA / "teapot.obj").exists():
        pytest.skip("assets unavailable")
    s = build_golden_scene_host(str(REFERENCE_DATA), str(ground))
    s.static_instance_count = len(s.instances)
    return s


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
    return jax.jit(
        lambda o_, d_: wide_ray_query(
            scene, tlc, tlo, o_, d_, 1e-4, 1e9, act, anyhit=anyhit
        )
    )(o, dd)


@pytest.mark.parametrize("chunk_max", [64, 1024])
def test_chunked_static_matches_plain(host_scene, chunk_max):
    s = host_scene
    plain = DevicePacker(s, wide=True).pack_frame(s)
    chunked = DevicePacker(s, wide=True, chunk_max=chunk_max).pack_frame(s)

    org, d = _probe_rays()
    sf = s.subframes[0]
    ha, _ = _query(plain, sf, org, d)
    hb, _ = _query(chunked, sf, org, d)
    np.testing.assert_array_equal(np.asarray(ha.inst), np.asarray(hb.inst))
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))
    np.testing.assert_array_equal(np.asarray(ha.thit), np.asarray(hb.thit))
    _, oa = _query(plain, sf, org, d, anyhit=True)
    _, ob = _query(chunked, sf, org, d, anyhit=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_chunked_dynamic_tail(host_scene):
    """Dynamic instances ride the per-frame tail (a tiny TLAS exit-chained
    into the static root); hits must still match the plain pack."""
    s = copy.deepcopy(host_scene)
    # demote the last two instances to dynamics of the single subframe
    s.static_instance_count = len(s.instances) - 2
    s.frame_static_end = s.static_instance_count
    s.subframe_entries = [
        (s.static_instance_count, len(s.instances))
        for _ in s.subframes
    ]
    plain = DevicePacker(s, wide=True).pack_frame(s)
    chunked = DevicePacker(s, wide=True, chunk_max=256).pack_frame(s)

    org, d = _probe_rays(seed=3)
    sf = s.subframes[0]
    ha, _ = _query(plain, sf, org, d)
    hb, _ = _query(chunked, sf, org, d)
    np.testing.assert_array_equal(np.asarray(ha.inst), np.asarray(hb.inst))
    np.testing.assert_array_equal(np.asarray(ha.thit), np.asarray(hb.thit))


def test_chunked_megakernel_render(host_scene):
    """End-to-end radiance through the megakernel: chunked == plain."""
    from pathtracing_tpu.render import render_pixels

    s = host_scene
    plain = DevicePacker(s, wide=True).pack_frame(s)
    chunked = DevicePacker(s, wide=True, chunk_max=256).pack_frame(s)
    W = TESTING.image_width
    n = 2 * W
    xs = np.arange(n, dtype=np.int32) % W
    ys = np.arange(n, dtype=np.int32) // W
    a = render_pixels(TESTING, plain, xs, ys, spp=2, megakernel=True)
    b = render_pixels(TESTING, chunked, xs, ys, spp=2, megakernel=True)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
