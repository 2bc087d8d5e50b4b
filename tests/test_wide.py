"""Wide mega-table traversal (ops/wide_traversal.py) vs the binary walk.

The wide tree is a DFS-order-preserving collapse of the same binary BVH
(accel/wide.py), so closest-hit and any-hit results must match the binary
path exactly up to compiled-fusion ulps on boundary candidates (the same
tie class tests/test_traversal.py already budgets vs the oracle).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.ops.wide_traversal import wide_ray_query
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from conftest import require_golden
from golden_scene import scene_device_from_golden


@pytest.fixture(scope="module", params=["w8", "w16"])
def setup(request):
    scene_g = load_golden(str(require_golden("scene.gold")))
    rays_g = load_golden(str(require_golden("rays.gold")))
    scene_bin = scene_device_from_golden(scene_g)
    scene_wide = scene_device_from_golden(
        scene_g, wide=True, leaf_bundle=None, wide_layout=request.param
    )
    return scene_bin, scene_wide, rays_g, scene_g


def _args(scene_g, rays_g, reps=1):
    origins = np.tile(rays_g["origins"], (reps, 1))
    dirs = np.tile(rays_g["dirs"], (reps, 1))
    R = len(origins)
    tlc = jnp.full(R, int(scene_g["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(scene_g["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    return R, tlc, tlo, org, d, act


def _compare_hits(hb, hw, label, tie_budget=0.002):
    thit_b = np.asarray(hb.thit)
    thit_w = np.asarray(hw.thit)
    np.testing.assert_array_equal(thit_w < 0, thit_b < 0, err_msg=label)
    h = thit_b >= 0
    np.testing.assert_allclose(
        thit_w[h], thit_b[h], rtol=2e-6, atol=1e-6, err_msg=label
    )
    same = (np.asarray(hw.inst) == np.asarray(hb.inst)) & (
        np.asarray(hw.prim) == np.asarray(hb.prim)
    )
    diff = h & ~same
    assert diff.mean() <= tie_budget, f"{label}: {diff.sum()} id mismatches"
    exact = h & same
    np.testing.assert_allclose(
        np.asarray(hw.bary_u)[exact], np.asarray(hb.bary_u)[exact],
        rtol=2e-5, atol=2e-6, err_msg=label,
    )
    np.testing.assert_array_equal(
        np.asarray(hw.back)[exact], np.asarray(hb.back)[exact], err_msg=label
    )


def test_closest_matches_binary(setup):
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    hb, _ = jax.jit(
        lambda o, dd: ray_query(scene_bin, tlc, tlo, o, dd, 0.0, 1e9, act)
    )(org, d)
    hw, _ = jax.jit(
        lambda o, dd: wide_ray_query(
            scene_wide, tlc, tlo, o, dd, 0.0, 1e9, act
        )
    )(org, d)
    _compare_hits(hb, hw, "closest")


def test_anyhit_matches_binary(setup):
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    _, occ_b = jax.jit(
        lambda o, dd: ray_query(
            scene_bin, tlc, tlo, o, dd, 1e-4, 1e9, act, anyhit=True
        )
    )(org, d)
    _, occ_w = jax.jit(
        lambda o, dd: wide_ray_query(
            scene_wide, tlc, tlo, o, dd, 1e-4, 1e9, act, anyhit=True
        )
    )(org, d)
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(occ_b))


def test_mixed_anyhit_and_windowed_tmax(setup):
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    rng = np.random.default_rng(3)
    ah = jnp.asarray(rng.random(R) < 0.5)
    tmax0 = jnp.asarray(
        np.where(rng.random(R) < 0.5, 15.0, 1e9).astype(np.float32)
    )
    tmin = jnp.asarray(
        np.where(rng.random(R) < 0.5, 1e-4, 0.5).astype(np.float32)
    )
    hb, ob = jax.jit(
        lambda o, dd: ray_query(
            scene_bin, tlc, tlo, o, dd, tmin, tmax0, act, anyhit=ah
        )
    )(org, d)
    hw, ow = jax.jit(
        lambda o, dd: wide_ray_query(
            scene_wide, tlc, tlo, o, dd, tmin, tmax0, act, anyhit=ah
        )
    )(org, d)
    ahm = np.asarray(ah)
    np.testing.assert_array_equal(np.asarray(ow)[ahm], np.asarray(ob)[ahm])
    cl = ~ahm
    thit_b = np.asarray(hb.thit)
    thit_w = np.asarray(hw.thit)
    np.testing.assert_array_equal((thit_w < 0)[cl], (thit_b < 0)[cl])
    hsel = cl & (thit_b >= 0)
    np.testing.assert_allclose(
        thit_w[hsel], thit_b[hsel], rtol=2e-6, atol=1e-6
    )


def test_inactive_lanes_stay_missed(setup):
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, _ = _args(scene_g, rays_g)
    act = jnp.asarray(np.arange(R) % 3 == 0)
    hw, occ = wide_ray_query(
        scene_wide, tlc, tlo, org, d, 0.0, 1e9, act
    )
    inactive = ~np.asarray(act)
    assert (np.asarray(hw.thit)[inactive] < 0).all()
    assert not np.asarray(occ)[inactive].any()


def test_leaf_bundle_sizes_agree(setup):
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    hb, _ = jax.jit(
        lambda o, dd: ray_query(scene_bin, tlc, tlo, o, dd, 0.0, 1e9, act)
    )(org, d)
    for bundle in (1, 16):
        sw = scene_device_from_golden(scene_g, wide=True, leaf_bundle=bundle)
        hw, _ = jax.jit(
            lambda o, dd, sw=sw: wide_ray_query(
                sw, tlc, tlo, o, dd, 0.0, 1e9, act
            )
        )(org, d)
        _compare_hits(hb, hw, f"bundle={bundle}")


def test_two_speed_bit_identical(setup):
    """K (two-speed period) and compaction schedule never change results."""
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    rng = np.random.default_rng(5)
    ah = jnp.asarray(rng.random(R) < 0.4)
    ref = None
    for le, sched in ((None, ()), (2, ((4, 4),)), (4, ((4, 4), (8, 4))),
                      (8, ((2, 8),))):
        hw, ow = jax.jit(
            lambda o, dd, le=le, sched=sched: wide_ray_query(
                scene_wide, tlc, tlo, o, dd, 1e-4, 1e9, act,
                anyhit=ah, leaf_every=le, compact_schedule=sched,
            )
        )(org, d)
        got = (
            np.asarray(hw.thit), np.asarray(hw.inst), np.asarray(hw.prim),
            np.asarray(ow),
        )
        if ref is None:
            ref = got
        else:
            for a, b in zip(ref, got):
                np.testing.assert_array_equal(a, b, err_msg=f"K={le}")


def test_ray_query_auto_dispatch(setup):
    """ray_query on a wide-enabled scene routes to the mega-table path."""
    scene_bin, scene_wide, rays_g, scene_g = setup
    R, tlc, tlo, org, d, act = _args(scene_g, rays_g)
    hb, _ = ray_query(scene_bin, tlc, tlo, org, d, 0.0, 1e9, act)
    hw, _ = ray_query(scene_wide, tlc, tlo, org, d, 0.0, 1e9, act)
    _compare_hits(hb, hw, "auto-dispatch")
