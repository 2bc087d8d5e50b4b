#!/usr/bin/env python3
"""Inverse rendering demo: recover an object's world POSITION by gradient
descent through the differentiable renderer.

Completes the inverse-rendering triptych (materials: inverse_albedo.py,
light: inverse_sun.py, geometry/pose: this) by optimizing the instance
TRANSFORM — the `inst_f` differentiable leaf (diff/render.py). Rendering is
differentiable at fixed hit topology: the hit's (u, v, t) are re-derived
from the hit ids through the instance inverse-transform, so moving the
instance shifts which surface point each pixel sees, and the interpolated
normals/albedo shift with it. That smooth shading signal is the pose
gradient (silhouette gradients are out of scope by design, so the demo uses
a smooth sphere whose normal field varies everywhere).

Only translation enters the loss, so the parameterization is exact and
cheap: for a row-vector transform M(t) = A·T(t) (translation lives in row
3, reference: math.hh:330-338), inv M(t) differs from inv A only in row 3:
`inv_row3 = -t @ Ainv[:3, :3]`. Inside jit only inst_f[idx, 9:12] (the
inv_transform row-3 slot, scene/device.py layout) depends on t.

Each optimizer step rebuilds the TLAS at the current pose estimate on the
host (the same rebuild the animation loop does per frame), so forward hit
topology tracks the moving object while the gradient linearizes around it.

    python examples/inverse_pose.py --steps 40
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

f32 = np.float32


def run(
    steps: int = 40,
    lr: float = 0.08,
    n_pixels: int = 2048,
    seed: int = 0,
    offset=(0.45, 0.1, -0.3),
    quiet: bool = False,
):
    from pathtracing_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.scene.builder import rebuild_static_tlas
    from pathtracing_tpu.scene.loader import make_transform
    from pathtracing_tpu.scene.types import TlasInstance
    from pathtracing_tpu.utils.hostmath import inverse4

    cfg = dataclasses.replace(TESTING, max_bounces=2)
    true_pos = np.array([0.0, 1.0, 0.0], f32)

    from pathtracing_tpu import models

    scene_host, _ = models.build("sphere_ground", cfg, sphere_pos=tuple(true_pos))
    sphere_mesh, sphere_blas = scene_host.meshes["sphere"]
    SPHERE = 1  # instance index (models/sphere_ground.py contract)

    # Pose parameterization constants: A = M(t=0); only inv row 3 moves.
    A = make_transform((0, 0, 0))
    Ainv3 = jnp.asarray(inverse4(A)[:3, :3])

    def build_at(t: np.ndarray):
        """SceneDevice with the sphere at t and a TLAS rebuilt to match
        (scene/builder.rebuild_static_tlas — the static twin of the
        animation loop's per-frame rebuild)."""
        scene_host.instances[SPHERE] = TlasInstance.create(
            sphere_blas, sphere_mesh, make_transform(tuple(t))
        )
        return rebuild_static_tlas(scene_host, cfg)

    rng = np.random.default_rng(seed)
    # concentrate samples in a window around the object (it sits near the
    # image center by construction) so most pixels carry pose signal
    w, h = cfg.image_width, cfg.image_height
    xs = jnp.asarray(
        rng.integers(int(w * 0.30), int(w * 0.70), n_pixels), jnp.int32
    )
    ys = jnp.asarray(
        rng.integers(int(h * 0.20), int(h * 0.80), n_pixels), jnp.int32
    )
    si = jnp.zeros(n_pixels, jnp.int32)

    def render_stack(dev, instf):
        c = path_trace_samples(
            cfg, dev._replace(inst_f=instf), xs, ys, si
        )
        return jnp.stack([c.x, c.y, c.z], -1)

    jit_render = jax.jit(render_stack)
    dev_true = build_at(true_pos)
    target = np.asarray(jit_render(dev_true, dev_true.inst_f))

    @jax.jit
    def loss_and_grad(dev, t, target):
        def f(t):
            row3 = -(t @ Ainv3)
            instf = dev.inst_f.at[SPHERE, 9:12].set(row3)
            r = render_stack(dev, instf)
            ok = jnp.isfinite(r) & jnp.isfinite(target)
            return jnp.mean(jnp.where(ok, (r - target) ** 2, 0.0))

        return jax.value_and_grad(f)(t)

    import optax

    t = jnp.asarray(true_pos + np.asarray(offset, f32))
    # decay the step size toward the end so gradient noise (chaotic
    # boundary paths) doesn't orbit the minimum
    opt = optax.adam(
        optax.exponential_decay(lr, transition_steps=max(steps, 1),
                                decay_rate=0.15)
    )
    opt_state = opt.init(t)
    tgt = jnp.asarray(target)

    history = []
    for step in range(steps):
        dev = build_at(np.asarray(t))
        loss, g = loss_and_grad(dev, t, tgt)
        updates, opt_state = opt.update(g, opt_state)
        t = optax.apply_updates(t, updates)
        err = float(np.linalg.norm(np.asarray(t) - true_pos))
        history.append((float(loss), err))
        if not quiet and (step % 5 == 0 or step == steps - 1):
            print(
                f"step {step:3d} loss {float(loss):.6f} "
                f"position error {err:.4f}"
            )
    return history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.08)
    args = ap.parse_args()
    h = run(args.steps, args.lr)
    print(
        f"position error: {h[0][1]:.4f} -> {h[-1][1]:.4f}; "
        f"loss {h[0][0]:.6f} -> {h[-1][0]:.6f}"
    )
