"""bf16-compressed node table (scene/device.py pack_nl5) is hit-identical.

The compressed AABBs are outward-rounded, so the slab accept set is a
superset of the exact one; every extra candidate fails the exact triangle
test / strict t bounds, hence closest-hit AND any-hit results must be
bit-identical to the f32 nl8 path on any ray set.
"""

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.scene.device import pack_nl5, with_bf16_nodes
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from golden_scene import scene_device_from_golden
from conftest import GOLDEN_DIR as GOLD


def _golden_rays():
    sg = load_golden(str(GOLD / "scene.gold"))
    rg = load_golden(str(GOLD / "rays.gold"))
    scene = scene_device_from_golden(sg)
    R = len(rg["origins"])
    tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rg["origins"][:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rg["dirs"][:, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    return scene, tlc, tlo, org, d, act


def test_pack_nl5_bounds_conservative():
    sg = load_golden(str(GOLD / "scene.gold"))
    scene = scene_device_from_golden(sg)
    nl8 = np.asarray(scene.nl8)
    nl5 = pack_nl5(nl8)
    bits = nl5[:, 0:3].view(np.uint32)
    hi = (bits & np.uint32(0xFFFF0000)).view(np.float32)
    lo = (bits << np.uint32(16)).view(np.float32)
    bmin = np.stack([hi[:, 0], lo[:, 0], hi[:, 1]], axis=1)
    bmax = np.stack([lo[:, 1], hi[:, 2], lo[:, 2]], axis=1)
    assert (bmin <= nl8[:, 0:3]).all()
    assert (bmax >= nl8[:, 3:6]).all()
    # within one bf16 ulp of the exact bounds (no wild inflation)
    span = np.maximum(np.abs(nl8[:, 0:6]), 1e-30)
    err = np.concatenate([nl8[:, 0:3] - bmin, bmax - nl8[:, 3:6]], axis=1)
    assert (err <= span * 2.0 ** -7 + 1e-30).all()
    # links unchanged (bit compare: 0xFFFFFFFF sentinels are NaN as floats)
    assert (
        np.ascontiguousarray(nl5[:, 3:5]).view(np.uint32)
        == np.ascontiguousarray(nl8[:, 6:8]).view(np.uint32)
    ).all()


def test_bf16_nodes_bit_identical_closest_hit():
    scene, tlc, tlo, org, d, act = _golden_rays()
    hit8, _ = ray_query(scene, tlc, tlo, org, d, 0.0, 1e9, act)
    hit5, _ = ray_query(
        with_bf16_nodes(scene), tlc, tlo, org, d, 0.0, 1e9, act
    )
    for a, b, name in zip(hit8, hit5, hit8._fields):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_bf16_nodes_bit_identical_anyhit():
    scene, tlc, tlo, org, d, act = _golden_rays()
    _, occ8 = ray_query(scene, tlc, tlo, org, d, 1e-4, 1e9, act, anyhit=True)
    _, occ5 = ray_query(
        with_bf16_nodes(scene), tlc, tlo, org, d, 1e-4, 1e9, act, anyhit=True
    )
    np.testing.assert_array_equal(np.asarray(occ8), np.asarray(occ5))


def test_bf16_nodes_bit_identical_two_speed_and_compaction():
    scene, tlc, tlo, org, d, act = _golden_rays()
    kw = dict(leaf_every=8, compact_after=16, compact_div=4)
    hit8, _ = ray_query(scene, tlc, tlo, org, d, 0.0, 1e9, act, **kw)
    hit5, _ = ray_query(
        with_bf16_nodes(scene), tlc, tlo, org, d, 0.0, 1e9, act, **kw
    )
    for a, b, name in zip(hit8, hit5, hit8._fields):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
