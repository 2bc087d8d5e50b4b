"""Differentiable rendering: analytic gradients vs central finite differences
(the BASELINE.json gate: allclose pixel gradients w.r.t. materials, lights,
vertex positions at fixed visibility)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.diff.render import render_value_and_grad
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden
from golden_scene import scene_device_from_golden

CFG = dataclasses.replace(TESTING, max_bounces=2)

XS = np.array([300, 320, 340, 360, 380, 400, 420, 440], np.int32)
YS = np.array([170, 180, 190, 160, 170, 180, 190, 200], np.int32)


@pytest.fixture(scope="module")
def scene():
    return scene_device_from_golden(
        load_golden(str(require_golden("scene.gold")))
    )


@pytest.fixture(scope="module")
def loss_and_grads(scene):
    xs, ys = jnp.asarray(XS), jnp.asarray(YS)
    si = jnp.zeros(len(XS), jnp.int32)
    return render_value_and_grad(CFG, scene, xs, ys, si)


def _loss(scene):
    xs, ys = jnp.asarray(XS), jnp.asarray(YS)
    si = jnp.zeros(len(XS), jnp.int32)
    c = path_trace_samples(CFG, scene, xs, ys, si)
    return float(jnp.mean(0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z))


def test_gradients_finite(loss_and_grads):
    loss, grads = loss_and_grads
    assert np.isfinite(loss)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
        assert np.count_nonzero(np.asarray(g)) > 0, k


@pytest.mark.parametrize(
    "field,eps,tol",
    [
        ("vattr", 1e-3, 0.08),     # materials / normals
        ("tri_pos", 1e-3, 0.15),   # vertex positions (re-derived hit)
        ("sf_light", 1e-3, 0.08),  # sun direction / color
        ("sf_cam", 1e-4, 0.15),    # camera parameters
    ],
)
def test_grad_matches_finite_difference(scene, loss_and_grads, field, eps, tol):
    _, grads = loss_and_grads
    g = np.asarray(grads[field])
    # probe the 3 largest-|grad| entries (guaranteed to matter for these rays)
    flat = np.abs(g).reshape(-1)
    order = np.argsort(flat)[::-1][:3]
    base = np.asarray(getattr(scene, field)).copy()
    checked = 0
    for idx in order:
        if flat[idx] == 0:
            continue
        coords = np.unravel_index(idx, g.shape)
        pert = base.copy()
        pert[coords] = base[coords] + eps
        lp = _loss(scene._replace(**{field: jnp.asarray(pert)}))
        pert[coords] = base[coords] - eps
        lm = _loss(scene._replace(**{field: jnp.asarray(pert)}))
        fd = (lp - lm) / (2 * eps)
        an = g[coords]
        # fixed-topology analytic grad vs FD (FD may cross visibility edges,
        # hence the generous tolerance)
        assert abs(fd - an) <= tol * max(abs(an), abs(fd), 1e-4), (
            field, coords, an, fd,
        )
        checked += 1
    assert checked >= 2, f"not enough nonzero grads for {field}"


def test_inverse_rendering_converges():
    """Gradient descent through the renderer recovers perturbed albedo."""
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))
    from inverse_albedo import run

    h = run(steps=12, n_pixels=128, quiet=True)
    assert h[-1] < h[0] * 0.5, (h[0], h[-1])


def test_inverse_pose_converges():
    """Pose (instance translation) gradients through inst_f recover a
    perturbed object position: the fixed-topology gradient shifts which
    surface point each pixel sees via the inverse-transform re-derivation,
    and the per-step host TLAS rebuild tracks the moving instance."""
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))
    from inverse_pose import run

    h = run(steps=9, n_pixels=2048, quiet=True)
    # (loss, position_error) pairs; the position error must at least halve
    assert h[-1][1] < h[0][1] * 0.5, (h[0], h[-1])


def test_sample_cone_grad_finite_at_pole():
    """u.x == 0 makes cos_theta == 1 exactly (a real pcg4d output); the
    sqrt(1-cos^2) gradient w.r.t. cos_theta_min must stay finite
    (round-5 on-chip find: one such lane poisoned the whole sf_light
    cotangent)."""
    import jax
    import jax.numpy as jnp
    from pathtracing_tpu.ops.samplers import sample_cone
    from pathtracing_tpu.utils.vec import Vec2, Vec3

    def f(cos_min):
        d = Vec3(jnp.zeros(3), jnp.zeros(3), jnp.ones(3))
        u = Vec2(jnp.asarray([0.0, 0.5, 1.0]), jnp.full(3, 0.25))
        v = sample_cone(d, jnp.full(3, cos_min), u)
        return (v.x + v.y + v.z).sum()

    g = jax.grad(f)(jnp.float32(0.9976))
    assert np.isfinite(float(g))
    # forward unchanged at the pole: u.x=0 => exactly the axis direction
    d = Vec3(jnp.zeros(1), jnp.zeros(1), jnp.ones(1))
    v = sample_cone(d, jnp.full(1, 0.9976),
                    Vec2(jnp.zeros(1), jnp.zeros(1)))
    assert float(v.z[0]) == 1.0


def test_ray_sphere_grad_finite_on_miss():
    """d sqrt(disc) at disc <= 0 (atmosphere-missing rays) must not
    poison cotangents (round-5 on-chip find)."""
    import jax
    import jax.numpy as jnp
    from pathtracing_tpu.ops.sky import ray_sphere_intersection
    from pathtracing_tpu.utils.vec import Vec3

    def f(ox):
        o = Vec3(ox, jnp.full_like(ox, 10.0), jnp.zeros_like(ox))
        d = Vec3(jnp.zeros_like(ox), jnp.ones_like(ox),
                 jnp.zeros_like(ox))
        hit, tmin, tmax = ray_sphere_intersection(
            o, d, Vec3(*(jnp.zeros_like(ox),) * 3), jnp.float32(1.0)
        )
        return jnp.where(hit, tmax - tmin, 0.0).sum()

    # rays at x=0 graze/hit, at x=5 miss entirely
    g = jax.grad(f)(jnp.asarray([0.0, 1.0, 5.0], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
