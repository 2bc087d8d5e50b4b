"""Pallas traversal kernel vs the XLA wavefront (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.ops.pallas_traversal import ray_query_pallas, vmem_fits
from pathtracing_tpu.ops.traversal import ray_query
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from conftest import require_golden
from golden_scene import scene_device_from_golden


@pytest.fixture(scope="module")
def setup():
    scene_g = load_golden(str(require_golden("scene.gold")))
    rays_g = load_golden(str(require_golden("rays.gold")))
    return scene_device_from_golden(scene_g), rays_g, scene_g


@pytest.mark.parametrize("anyhit", [False, True])
@pytest.mark.parametrize("leaf_every", [None, 4])
def test_pallas_matches_xla(setup, anyhit, leaf_every):
    scene, rays_g, scene_g = setup
    assert vmem_fits(scene)
    R = 1000  # non-multiple of block to exercise padding
    tlc = jnp.full(R, int(scene_g["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(scene_g["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rays_g["origins"][:R, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rays_g["dirs"][:R, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    tmin = 1e-4 if anyhit else 0.0

    hit_p, occ_p = ray_query_pallas(
        scene, tlc, tlo, org, d, tmin, 1e9, act, anyhit=anyhit,
        block=256, interpret=True, leaf_every=leaf_every,
    )
    hit_x, occ_x = ray_query(
        scene, tlc, tlo, org, d, tmin, 1e9, act, anyhit=anyhit
    )

    if anyhit:
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))
    else:
        np.testing.assert_array_equal(np.asarray(hit_p.inst), np.asarray(hit_x.inst))
        np.testing.assert_array_equal(np.asarray(hit_p.prim), np.asarray(hit_x.prim))
        np.testing.assert_allclose(
            np.asarray(hit_p.thit), np.asarray(hit_x.thit), rtol=1e-6, atol=1e-6
        )


def test_auto_falls_back_when_lowering_fails(setup, monkeypatch):
    """ray_query_auto must transparently fall back to the XLA path when the
    Pallas kernel fails to lower (which it does on current Mosaic: dynamic
    gathers must be same-shape — see ops/pallas_traversal.py docstring)."""
    import pathtracing_tpu.ops.pallas_traversal as PT

    scene, rays_g, scene_g = setup

    def boom(*a, **k):
        raise NotImplementedError("Only 2D gather is supported")

    monkeypatch.setattr(PT, "ray_query_pallas", boom)

    R = 64
    tlc = jnp.full(R, int(scene_g["tlas"][0]), jnp.int32)
    tlo = jnp.full(R, int(scene_g["tlas"][1]), jnp.int32)
    org = Vec3(*(jnp.asarray(rays_g["origins"][:R, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(rays_g["dirs"][:R, i]) for i in range(3)))
    act = jnp.ones(R, bool)
    hit_a, _ = PT.ray_query_auto(
        scene, tlc, tlo, org, d, 0.0, 1e9, act, block=256, interpret=True
    )
    hit_x, _ = ray_query(scene, tlc, tlo, org, d, 0.0, 1e9, act)
    np.testing.assert_array_equal(np.asarray(hit_a.inst), np.asarray(hit_x.inst))
