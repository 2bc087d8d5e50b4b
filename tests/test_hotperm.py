"""Hot-row permutation + hot-advance micro-steps (accel/hotperm.py,
ops/wide_traversal._wide_cheap_step(hot=True)).

The permutation only moves row ADDRESSES (cursor fields rewritten through
the same map), and hot advances are cheap steps whose non-hot lanes
freeze — the conservative two-speed deferral — so hits, occlusion and
radiance must be bit-identical to the un-permuted chunked pack for every
hot table size and every hot_k.
"""

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


def _probe_rays(n=4096, seed=3):
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


def test_permutation_preserves_hits(host_scene):
    """wide_ray_query on the permuted table (hot table unused there) ==
    the plain chunked pack: the cursor-graph rewrite is self-consistent."""
    s = host_scene
    base = DevicePacker(s, wide=True, chunk_max=256).pack_frame(s)
    hot = DevicePacker(
        s, wide=True, chunk_max=256, hot_rows=512
    ).pack_frame(s)
    assert hot.hot_rows is not None and hot.hot_rows.shape[0] == 512
    # permutation actually moved things: tables differ as arrays...
    assert not np.array_equal(
        np.asarray(base.wide_rows), np.asarray(hot.wide_rows)
    )
    # ...but the hot table is exactly the permuted table's prefix
    np.testing.assert_array_equal(
        np.asarray(hot.hot_rows), np.asarray(hot.wide_rows)[:512]
    )
    org, d = _probe_rays()
    sf = s.subframes[0]
    ha, _ = _query(base, sf, org, d)
    hb, _ = _query(hot, sf, org, d)
    np.testing.assert_array_equal(np.asarray(ha.inst), np.asarray(hb.inst))
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))
    np.testing.assert_array_equal(np.asarray(ha.thit), np.asarray(hb.thit))
    _, oa = _query(base, sf, org, d, anyhit=True)
    _, ob = _query(hot, sf, org, d, anyhit=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_measured_score_orders_hot_prefix(host_scene):
    """A synthetic per-row score places the top-scored rows at [0, H) in
    score order."""
    from pathtracing_tpu.accel.hotperm import build_perm

    rng = np.random.default_rng(0)
    score = rng.permutation(1000).astype(np.float64)
    perm = build_perm(score, 16)
    top = np.argsort(-score)[:16]
    np.testing.assert_array_equal(perm[top], np.arange(16))
    # the rest keep relative order
    rest_old = np.setdiff1d(np.arange(1000), top)
    assert (np.diff(perm[rest_old]) > 0).all()


@pytest.mark.parametrize("hot_k", [1, 3])
def test_hot_advance_megakernel_identical(host_scene, hot_k):
    """Megakernel radiance with hot advances == without.

    PER-SAMPLE sums are bit-identical (spp=1 per sample_base). Whole-frame
    sums at spp > 2 may differ by ~1 ulp: hot advances reorder lane death
    times, hence the per-pixel scatter-add fold order (documented in
    _wide_cheap_step) — so the multi-spp check runs per-sample here."""
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    s = host_scene
    base = DevicePacker(s, wide=True, chunk_max=256).pack_frame(s)
    hot = DevicePacker(
        s, wide=True, chunk_max=256, hot_rows=768
    ).pack_frame(s)
    W = TESTING.image_width
    n = 2 * W
    for sb in (0, 2):
        a = path_trace_megakernel(
            TESTING, base, n, 1, sb, lanes=2048, hot_k=0
        )
        b = path_trace_megakernel(
            TESTING, hot, n, 1, sb, lanes=2048, hot_k=hot_k
        )
        for ca, cb in zip((a.x, a.y, a.z), (b.x, b.y, b.z)):
            np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_hot_k_requires_hot_table(host_scene):
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    s = host_scene
    base = DevicePacker(s, wide=True, chunk_max=256).pack_frame(s)
    with pytest.raises(ValueError):
        path_trace_megakernel(TESTING, base, 64, 1, lanes=256, hot_k=2)
