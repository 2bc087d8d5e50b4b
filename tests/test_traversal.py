"""Wavefront traversal vs oracle ray_query on 4096 deterministic rays
(golden: tools/oracle/harness.cc cmd_rays)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from conftest import require_golden
from golden_scene import scene_device_from_golden


@pytest.fixture(scope="module")
def setup():
    scene_g = load_golden(str(require_golden("scene.gold")))
    rays_g = load_golden(str(require_golden("rays.gold")))
    scene = scene_device_from_golden(scene_g)
    return scene, rays_g, scene_g


def _trace(scene, scene_g, origins, dirs, tmin, anyhit):
    R = len(origins)
    tlas_count = jnp.full(R, int(scene_g["tlas"][0]), jnp.int32)
    tlas_offset = jnp.full(R, int(scene_g["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    active = jnp.ones(R, bool)
    fn = jax.jit(
        lambda o, dd: ray_query(
            scene, tlas_count, tlas_offset, o, dd, tmin, 1e9, active, anyhit=anyhit
        )
    )
    return fn(org, d)


def test_closest_hit_matches_oracle(setup):
    scene, rays_g, scene_g = setup
    hit, _ = _trace(scene, scene_g, rays_g["origins"], rays_g["dirs"], 0.0, False)

    miss_ref = rays_g["thit"] < 0
    miss_got = np.asarray(hit.thit) < 0
    np.testing.assert_array_equal(miss_got, miss_ref)

    h = ~miss_ref
    inst_ref = rays_g["inst"].view(np.int32)
    inst_got = np.asarray(hit.inst)
    prim_got = np.asarray(hit.prim)

    # t always matches tightly, even when ids differ (coincident surfaces).
    np.testing.assert_allclose(
        np.asarray(hit.thit)[h], rays_g["thit"][h], rtol=2e-5, atol=1e-5
    )

    # Ids must match except where two coincident triangles tie in t within
    # float ulps: XLA fuses mul+add into FMA inside the compiled loop while
    # the IEEE oracle does not, so the strict `t < tmax` re-confirm can pick
    # the other of two equal-t candidates. Allow <=0.2% such ties.
    same = (inst_got == inst_ref) & (prim_got == rays_g["prim"].view(np.int32))
    diff = h & ~same
    assert diff.mean() <= 0.002, f"{diff.sum()} id mismatches"
    if diff.any():
        np.testing.assert_allclose(
            np.asarray(hit.thit)[diff], rays_g["thit"][diff], rtol=1e-6
        )

    exact = h & same
    np.testing.assert_array_equal(
        np.asarray(hit.back)[exact].astype(np.uint32), rays_g["back"][exact]
    )
    np.testing.assert_allclose(
        np.asarray(hit.bary_u)[exact], rays_g["bary"][exact, 0], rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(hit.bary_v)[exact], rays_g["bary"][exact, 1], rtol=2e-5, atol=2e-6
    )


def test_anyhit_matches_oracle(setup):
    scene, rays_g, scene_g = setup
    _, occluded = _trace(scene, scene_g, rays_g["origins"], rays_g["dirs"], 1e-4, True)
    np.testing.assert_array_equal(
        np.asarray(occluded).astype(np.uint32), rays_g["occluded"]
    )


def test_inactive_lanes_do_not_trace(setup):
    scene, rays_g, scene_g = setup
    R = 8
    origins = rays_g["origins"][:R]
    dirs = rays_g["dirs"][:R]
    tlas_count = jnp.full(R, int(scene_g["tlas"][0]), jnp.int32)
    tlas_offset = jnp.full(R, int(scene_g["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    active = jnp.zeros(R, bool)
    hit, occ = ray_query(
        scene, tlas_count, tlas_offset, org, d, 0.0, 1e9, active
    )
    assert (np.asarray(hit.thit) == -1).all()
    assert not np.asarray(occ).any()
