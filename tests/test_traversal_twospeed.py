"""Two-speed traversal loop must be bit-identical to the one-speed loop.

ray_query(leaf_every=K) defers leaf work (BLAS entry, triangle tests) to
every K-th iteration; this is a pure scheduling change — results must match
the default loop bit-for-bit on the golden scene and on random scenes, in
closest-hit and any-hit mode, with and without argsort compaction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from golden_scene import scene_device_from_golden
from test_traversal_property import _build_scene


def _assert_hits_equal(a, b):
    ah, aocc = a
    bh, bocc = b
    for fa, fb in zip(ah, bh):
        fa, fb = np.asarray(fa), np.asarray(fb)
        np.testing.assert_array_equal(fa, fb)
    np.testing.assert_array_equal(np.asarray(aocc), np.asarray(bocc))


@pytest.mark.parametrize("anyhit", [False, True])
@pytest.mark.parametrize("compact_after", [None, 32])
def test_twospeed_matches_golden_scene(anyhit, compact_after, golden_dir):
    sg = load_golden(str(golden_dir / "scene.gold"))
    rg = load_golden(str(golden_dir / "rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)

    args = (scene, tlc, tlo, org, d, 0.0, 1e9, act)
    base = ray_query(*args, anyhit=anyhit, compact_after=compact_after,
                     leaf_every=None)
    for K in (2, 4, 8, 12):
        two = ray_query(*args, anyhit=anyhit, compact_after=compact_after,
                        leaf_every=K)
        _assert_hits_equal(base, two)


def test_mixed_anyhit_matches_pure_modes(golden_dir):
    """Per-lane anyhit (merged shadow+bounce wavefront) must reproduce the
    pure anyhit=True and anyhit=False results lane-for-lane."""
    import jax

    sg = load_golden(str(golden_dir / "scene.gold"))
    rg = load_golden(str(golden_dir / "rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)

    cl = ray_query(scene, tlc, tlo, org, d, 0.0, 1e9, act, anyhit=False)
    ah = ray_query(scene, tlc, tlo, org, d, 0.0, 1e9, act, anyhit=True)

    cat3 = lambda a: Vec3(
        jnp.concatenate([a.x, a.x]),
        jnp.concatenate([a.y, a.y]),
        jnp.concatenate([a.z, a.z]),
    )
    mask = jnp.concatenate([jnp.ones(R, bool), jnp.zeros(R, bool)])
    mh, mocc = ray_query(
        scene,
        jnp.concatenate([tlc, tlc]), jnp.concatenate([tlo, tlo]),
        cat3(org), cat3(d), 0.0, 1e9, jnp.ones(2 * R, bool), anyhit=mask,
    )
    np.testing.assert_array_equal(np.asarray(mocc[:R]), np.asarray(ah[1]))
    for name in ("thit", "inst", "prim", "bary_u", "back"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mh, name)[R:]), np.asarray(getattr(cl[0], name))
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_twospeed_matches_random_scene(seed):
    rng = np.random.default_rng(seed)
    scene, tlas, instances, handles, mesh_arrays = _build_scene(rng)
    n = 512
    org = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)

    tlc = jnp.full(n, tlas.node_count, jnp.int32)
    tlo = jnp.full(n, tlas.node_offset, jnp.int32)
    args = (
        scene, tlc, tlo,
        Vec3(*(jnp.asarray(org[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
        0.0, 1e9, jnp.ones(n, bool),
    )
    for anyhit in (False, True):
        base = ray_query(*args, anyhit=anyhit, leaf_every=None)
        two = ray_query(*args, anyhit=anyhit, leaf_every=4)
        _assert_hits_equal(base, two)
        mid = ray_query(*args, anyhit=anyhit, leaf_every=4, mid_entry=True)
        _assert_hits_equal(base, mid)


@pytest.mark.parametrize("anyhit", [False, True])
@pytest.mark.parametrize("compact_after", [None, 32])
def test_mid_entry_matches_golden_scene(anyhit, compact_after, golden_dir):
    """The entry-capable cheap step (mid_entry=True) is a pure scheduling
    change: TLAS-leaf lanes descend immediately instead of freezing, but
    per-lane candidate order is unchanged — results must be bit-identical."""
    sg = load_golden(str(golden_dir / "scene.gold"))
    rg = load_golden(str(golden_dir / "rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)

    args = (scene, tlc, tlo, org, d, 0.0, 1e9, act)
    base = ray_query(*args, anyhit=anyhit, compact_after=compact_after,
                     leaf_every=None)
    for K in (2, 8, 12):
        mid = ray_query(*args, anyhit=anyhit, compact_after=compact_after,
                        leaf_every=K, mid_entry=True)
        _assert_hits_equal(base, mid)


@pytest.mark.parametrize("anyhit", [False, True])
@pytest.mark.parametrize("mid_entry", [False, True])
def test_unrolled_matches_golden_scene(anyhit, mid_entry, golden_dir):
    """unroll=True lays the K-step period out statically in one while_loop
    iteration — a pure scheduling change, results must be bit-identical,
    with and without compaction stages."""
    sg = load_golden(str(golden_dir / "scene.gold"))
    rg = load_golden(str(golden_dir / "rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)

    args = (scene, tlc, tlo, org, d, 0.0, 1e9, act)
    base = ray_query(*args, anyhit=anyhit, leaf_every=None)
    for compact_after in (None, 32):
        for K in (4, 8):
            unr = ray_query(*args, anyhit=anyhit, compact_after=compact_after,
                            leaf_every=K, mid_entry=mid_entry, unroll=True)
            _assert_hits_equal(base, unr)
