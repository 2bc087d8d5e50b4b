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
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

f32 = np.float32


def _write_sphere_obj(path: str, n_u: int = 48, n_v: int = 24) -> None:
    """Dense unit UV sphere with exact radial per-vertex normals and a
    smooth warm albedo gradient (so both normal AND albedo interpolation
    carry pose signal)."""
    vs, ns, cols = [], [], []
    for j in range(n_v + 1):
        theta = np.pi * j / n_v
        for i in range(n_u):
            phi = 2 * np.pi * i / n_u
            x = np.sin(theta) * np.cos(phi)
            y = np.cos(theta)
            z = np.sin(theta) * np.sin(phi)
            vs.append((x, y, z))
            ns.append((x, y, z))
    faces = []
    idx = lambda j, i: j * n_u + (i % n_u) + 1
    for j in range(n_v):
        for i in range(n_u):
            a, b = idx(j, i), idx(j, i + 1)
            c, d = idx(j + 1, i + 1), idx(j + 1, i)
            if j > 0:
                faces.append((a, b, c))
            if j < n_v - 1:
                faces.append((a, c, d))
    with open(path, "w") as f:
        f.write("mtllib sphere.mtl\nusemtl body\n")
        for v in vs:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for n in ns:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
    with open(os.path.join(os.path.dirname(path), "sphere.mtl"), "w") as f:
        f.write("newmtl body\nKd 0.75 0.45 0.25\nPr 0.45\nPm 0.0\n")


def _write_ground_obj(path: str, half: float = 30.0) -> None:
    with open(path, "w") as f:
        f.write("mtllib ground.mtl\nusemtl g\n")
        for x, z in ((-half, -half), (half, -half), (half, half), (-half, half)):
            f.write(f"v {x} 0 {z}\n")
        f.write("vn 0 1 0\n")
        f.write("f 1//1 2//1 3//1\nf 1//1 3//1 4//1\n")
    with open(os.path.join(os.path.dirname(path), "ground.mtl"), "w") as f:
        f.write("newmtl g\nKd 0.55 0.55 0.55\nPr 0.9\nPm 0.0\n")


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

    from pathtracing_tpu.accel.builder_py import build_tlas
    from pathtracing_tpu.config import TESTING
    from pathtracing_tpu.ops.integrator import path_trace_samples
    from pathtracing_tpu.scene.builder import SceneBuilder
    from pathtracing_tpu.scene.device import pack_scene
    from pathtracing_tpu.scene.loader import make_transform
    from pathtracing_tpu.scene.types import Subframe, TlasInstance
    from pathtracing_tpu.utils.hostmath import inverse4

    cfg = dataclasses.replace(TESTING, max_bounces=2)
    true_pos = np.array([0.0, 1.0, 0.0], f32)

    tmp = tempfile.mkdtemp(prefix="inverse_pose_")
    sphere_path = os.path.join(tmp, "sphere.obj")
    ground_path = os.path.join(tmp, "ground.obj")
    _write_sphere_obj(sphere_path)
    _write_ground_obj(ground_path)

    b = SceneBuilder()
    b.add_mesh("ground", ground_path)
    b.add_mesh("sphere", sphere_path)
    b.add_instance("ground")
    b.add_instance("sphere", pos=tuple(true_pos))
    b.set_camera(position=(0, 2.2, 6.0), pitch_yaw_roll=(10, 0, 0), fov=50)
    b.set_light(direction=(0.45, 1.0, 0.35), color=(4, 4, 4))
    blas_len = len(b.scene.bvh_buf.nodes)  # BLAS-only region; TLAS appends
    scene_host, _ = b.build(cfg)
    cam = scene_host.subframes[0].cam
    light = scene_host.subframes[0].light
    sphere_mesh, sphere_blas = scene_host.meshes["sphere"]
    SPHERE = 1  # instance index

    # Pose parameterization constants: A = M(t=0); only inv row 3 moves.
    A = make_transform((0, 0, 0))
    Ainv3 = jnp.asarray(inverse4(A)[:3, :3])

    def build_at(t: np.ndarray):
        """SceneDevice with the sphere at t and a TLAS rebuilt to match
        (the per-frame rebuild from the animation loop, scene/loader.py)."""
        s = scene_host
        s.bvh_buf.nodes = s.bvh_buf.nodes[:blas_len]
        s.bvh_buf.links = s.bvh_buf.links[: 8 * blas_len]
        s.instances[SPHERE] = TlasInstance.create(
            sphere_blas, sphere_mesh, make_transform(tuple(t))
        )
        tlas = build_tlas(
            s.instances, list(range(len(s.instances))), s.bvh_buf.nodes, s.bvh_buf
        )
        s.subframes = [
            Subframe(tlas, cam, light) for _ in range(cfg.subframe_count)
        ]
        return pack_scene(
            s.mesh_buf.arrays(),
            s.bvh_buf.nodes,
            s.bvh_buf.links,
            s.instances,
            s.subframes,
        )

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
