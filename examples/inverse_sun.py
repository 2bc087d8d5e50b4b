#!/usr/bin/env python3
"""Inverse rendering demo: recover the sun direction by gradient descent.

Renders a target with the true sun, tilts the sun by ~15 degrees, then
optimizes the direction back by minimizing L2 against the target through
the differentiable renderer — gradients flow through NEE/MIS, the sun-disk
miss shading, and the Nishita sky to the light table (diff/render.py).

    python examples/inverse_sun.py --steps 60
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

import numpy as np


def run(steps: int = 60, lr: float = 0.01, n_pixels: int = 768, seed: int = 0, quiet=False, tilt_rad: float = 0.1):
    from pathtracing_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    cfg = dataclasses.replace(TESTING, max_bounces=2)
    scene = scene_device_from_golden(
        load_golden(
            os.path.join(
                os.path.dirname(__file__), "..", "tests", "golden", "scene.gold"
            )
        )
    )

    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.integers(0, cfg.image_width, n_pixels), jnp.int32)
    ys = jnp.asarray(rng.integers(0, cfg.image_height, n_pixels), jnp.int32)
    si = jnp.zeros(n_pixels, jnp.int32)

    sf_light0 = np.asarray(scene.sf_light).copy()
    true_dir = sf_light0[0, 0:3] / np.linalg.norm(sf_light0[0, 0:3])

    def render(direction):
        direction = direction / jnp.linalg.norm(direction)
        sf = jnp.asarray(sf_light0).at[:, 0:3].set(direction[None, :])
        c = path_trace_samples(cfg, scene._replace(sf_light=sf), xs, ys, si)
        return jnp.stack([c.x, c.y, c.z], -1)

    target = render(jnp.asarray(true_dir))

    # tilt the sun by ~tilt_rad radians
    tilt = np.array([tilt_rad, 0.0, 0.0], np.float32)
    start = true_dir + tilt
    start /= np.linalg.norm(start)

    @jax.jit
    def loss_and_grad(direction):
        def loss_fn(d):
            r = render(d)
            return jnp.mean(jnp.where(jnp.isfinite(r), (r - target) ** 2, 0.0))

        return jax.value_and_grad(loss_fn)(direction)

    import optax

    opt = optax.adam(lr)
    d = jnp.asarray(start)
    opt_state = opt.init(d)

    history = []
    for step in range(steps):
        loss, g = loss_and_grad(d)
        updates, opt_state = opt.update(g, opt_state)
        d = optax.apply_updates(d, updates)
        d = d / jnp.linalg.norm(d)
        err_deg = float(
            np.degrees(
                np.arccos(np.clip(np.dot(np.asarray(d), true_dir), -1, 1))
            )
        )
        history.append((float(loss), err_deg))
        if not quiet and (step % 10 == 0 or step == steps - 1):
            print(f"step {step:3d} loss {float(loss):.6f} angular error {err_deg:.2f} deg")
    return history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--tilt", type=float, default=0.1)
    args = ap.parse_args()
    h = run(args.steps, args.lr, tilt_rad=args.tilt)
    print(
        f"angular error: {h[0][1]:.2f} -> {h[-1][1]:.2f} degrees; "
        f"loss {h[0][0]:.6f} -> {h[-1][0]:.6f}"
    )
