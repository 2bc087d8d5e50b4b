#!/usr/bin/env python3
"""Inverse rendering on the FAST gradient path: recover the sun direction
from a frame loss with megakernel-record / traversal-free-replay
gradients (diff/render.make_fast_grad_frame_fn).

Pass 1 of every step runs the persistent-lane megakernel forward
(recording per-bounce hit topology); pass 2 differentiates a replay with
zero traversal in the AD graph. Gradients equal the slow path's
fixed-topology gradients (tests/test_diff_fast.py).

    python examples/inverse_fast.py --steps 20
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


def run(steps: int = 20, lr: float = 0.05, rows: int = 48, quiet=False):
    from pathtracing_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.diff.render import make_fast_grad_frame_fn
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel
    from pathtracing_tpu.utils.goldenio import load_golden
    from golden_scene import scene_device_from_golden

    cfg = dataclasses.replace(TESTING, max_bounces=2)
    scene = scene_device_from_golden(
        load_golden(
            os.path.join(
                os.path.dirname(__file__), "..", "tests", "golden",
                "scene.gold",
            )
        ),
        wide=True,
    )

    n_pixels = cfg.image_width * rows  # a row-major band of the frame

    # target radiance under the TRUE sun, rendered by the megakernel
    acc = path_trace_megakernel(cfg, scene, n_pixels, 1, lanes=2048)
    target = jnp.stack([acc.x, acc.y, acc.z], -1)

    def loss_fn(c):
        img = jnp.stack([c.x, c.y, c.z], -1)
        return jnp.mean((img - target) ** 2)

    step_fn = make_fast_grad_frame_fn(
        cfg, n_pixels, 1, fields=("sf_light",), loss_fn=loss_fn,
        lanes=2048,
    )

    # perturb the sun direction (sf_light row 0, cols 0:3)
    sf0 = np.asarray(scene.sf_light).copy()
    true_dir = sf0[0, 0:3].copy()
    bad = sf0.copy()
    bad[0, 0:3] = _normalize(true_dir + np.array([0.25, -0.1, 0.2], np.float32))
    cur = scene._replace(sf_light=jnp.asarray(bad))

    for i in range(steps):
        loss, grads = step_fn(cur)
        g = np.asarray(grads["sf_light"])
        nxt = np.asarray(cur.sf_light) - lr * g
        nxt[:, 0:3] = _normalize(nxt[0, 0:3])
        cur = cur._replace(sf_light=jnp.asarray(nxt))
        err = float(
            np.degrees(
                np.arccos(
                    np.clip(np.dot(_normalize(np.asarray(cur.sf_light)[0, 0:3]),
                                   _normalize(true_dir)), -1, 1)
                )
            )
        )
        if not quiet:
            print(f"step {i:3d}: loss {float(loss):.6f}  sun error {err:.2f} deg",
                  flush=True)
    return err


def _normalize(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--rows", type=int, default=48)
    args = ap.parse_args()
    err = run(args.steps, args.lr, args.rows)
    print(f"final sun-direction error: {err:.2f} deg")
