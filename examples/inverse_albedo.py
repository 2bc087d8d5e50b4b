#!/usr/bin/env python3
"""Inverse rendering demo: recover a perturbed albedo by gradient descent.

Renders a target image with the true materials, perturbs the vertex albedo
table, then optimizes it back by minimizing L2 against the target through
the differentiable renderer (fixed-topology gradients, diff/render.py).

    python examples/inverse_albedo.py --steps 40
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def run(steps: int = 40, lr: float = 0.02, n_pixels: int = 512, seed: int = 0, quiet=False):
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
        load_golden(os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "scene.gold"))
    )

    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.integers(200, 500, n_pixels), jnp.int32)
    ys = jnp.asarray(rng.integers(100, 300, n_pixels), jnp.int32)
    si = jnp.zeros(n_pixels, jnp.int32)

    def render(vattr):
        c = path_trace_samples(cfg, scene._replace(vattr=vattr), xs, ys, si)
        return jnp.stack([c.x, c.y, c.z], -1)

    target = render(scene.vattr)

    # perturb albedo columns (3:6) of the vertex attribute table
    vattr0 = np.asarray(scene.vattr).copy()
    perturbed = vattr0.copy()
    perturbed[:, 3:6] = np.clip(
        perturbed[:, 3:6] * rng.uniform(0.4, 1.6, (len(vattr0), 3)).astype(np.float32),
        0.0, 1.0,
    )

    @jax.jit
    def loss_and_grad(vattr):
        def loss_fn(v):
            return jnp.mean((render(v) - target) ** 2)

        return jax.value_and_grad(loss_fn)(vattr)

    v = jnp.asarray(perturbed)
    mask = np.zeros_like(vattr0)
    mask[:, 3:6] = 1.0  # only optimize albedo
    mask = jnp.asarray(mask)

    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(v)

    history = []
    for step in range(steps):
        loss, g = loss_and_grad(v)
        updates, opt_state = opt.update(g * mask, opt_state)
        v = optax.apply_updates(v, updates * mask)
        # clamp only the albedo slice (normals are legitimately negative)
        v = v.at[:, 3:6].set(jnp.clip(v[:, 3:6], 0.0, 1.0))
        history.append(float(loss))
        if not quiet and (step % 5 == 0 or step == steps - 1):
            print(f"step {step:3d} loss {float(loss):.6f}")
    return history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.02)
    args = ap.parse_args()
    h = run(args.steps, args.lr)
    print(f"loss: {h[0]:.6f} -> {h[-1]:.6f} ({h[0]/max(h[-1],1e-12):.1f}x reduction)")
