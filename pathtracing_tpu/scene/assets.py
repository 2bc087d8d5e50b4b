"""Procedural substitute assets.

Three meshes are stripped from the reference mirror
(/root/reference/.MISSING_LARGE_BLOBS): data/terrain.obj, data/bunny.obj,
data/pine_tree.obj. ``ensure_substitutes`` generates deterministic
stand-ins with the same *roles*: a heightfield terrain with a transmissive
water plane (placement rules key off material.z != 0, reference:
scene.cc:119,159), a bunny-sized blob, and a conical pine tree. Scenes
using them cannot be validated against the reference's golden frames, but
every code path (gradients, placement, animation, rendering) exercises
identically.
"""

from __future__ import annotations

import os

import numpy as np

f32 = np.float32


def _height(x: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Deterministic terrain shaped to the animation's implied landmarks
    (the hard-coded camera/creature track, reference: scene.cc:319-627):
    a ~30-unit mountain under the buddha statue (-39, 30, 40), a ~13-unit
    plateau under the teapot start (40, 14, 14), mid hills on the armadillo
    path (~35, 10, 52), low coast for the dragon walk (x < -70) and the
    bunny beach (~43, 5, -84). Gradients span -10..28
    (reference: scene.cc:141-152)."""

    def bump(cx, cz, r, a):
        return a * np.exp(-(((x - cx) ** 2 + (z - cz) ** 2) / (r * r)))

    base = (
        2.5 * np.sin(x * 0.045 + 1.7) * np.cos(z * 0.039 - 0.6)
        + 1.5 * np.sin(x * 0.11 - 0.9) * np.sin(z * 0.13 + 2.2)
        + 1.0 * np.cos(x * 0.23 + z * 0.19)
        + 2.0
    )
    h = (
        base
        + bump(-39, 40, 30, 26.5)   # buddha mountain
        + bump(46, 16, 20, 11.0)    # teapot plateau
        + bump(32, 56, 16, 6.0)     # armadillo hills
        + bump(-20, -35, 50, 7.0)   # central highland
        + bump(70, 85, 40, 12.0)    # far corner ridge
        + bump(-60, -90, 45, 10.0)
        + bump(43, -84, 30, 2.0)    # bunny beach shelf
        + bump(-78, 48, 22, 5.0)    # dragon walk shelf
        - bump(-95, 80, 28, 9.0)    # dragon coast water
        - bump(95, -25, 40, 8.0)    # eastern bay
    )
    return h.astype(f32)


WATER_LEVEL = -1.5


def write_terrain_obj(path: str, n: int = 160, extent: float = 130.0) -> None:
    xs = np.linspace(-extent, extent, n, dtype=f32)
    zs = np.linspace(-extent, extent, n, dtype=f32)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = _height(X, Z)

    lines = ["mtllib terrain.mtl"]
    for i in range(n):
        for j in range(n):
            lines.append(f"v {X[i,j]:.4f} {Y[i,j]:.4f} {Z[i,j]:.4f}")
    # per-vertex normals from central differences
    gx = np.gradient(Y, xs, axis=0)
    gz = np.gradient(Y, zs, axis=1)
    ln = np.sqrt(gx * gx + 1.0 + gz * gz)
    for i in range(n):
        for j in range(n):
            lines.append(
                f"vn {-gx[i,j]/ln[i,j]:.4f} {1.0/ln[i,j]:.4f} {-gz[i,j]/ln[i,j]:.4f}"
            )
    lines.append("usemtl ground")
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j + 1
            b = (i + 1) * n + j + 1
            c = (i + 1) * n + j + 2
            d = i * n + j + 2
            lines.append(f"f {a}//{a} {b}//{b} {c}//{c}")
            lines.append(f"f {a}//{a} {c}//{c} {d}//{d}")

    # water plane at WATER_LEVEL (transmissive => material.z != 0)
    base = n * n
    w = extent
    for k, (px, pz) in enumerate(
        [(-w, -w), (w, -w), (w, w), (-w, w)]
    ):
        lines.append(f"v {px:.1f} {WATER_LEVEL} {pz:.1f}")
    base_n = n * n
    lines.append("vn 0 1 0")
    wn = base_n + 1
    lines.append("usemtl water")
    lines.append(f"f {base+1}//{wn} {base+2}//{wn} {base+3}//{wn}")
    lines.append(f"f {base+1}//{wn} {base+3}//{wn} {base+4}//{wn}")

    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(os.path.dirname(path), "terrain.mtl"), "w") as f:
        f.write(
            "newmtl ground\nKd 0.5 0.5 0.5\nPr 1.0\nPm 0.0\n"
            "newmtl water\nKd 0.2 0.35 0.45\nPr 0.05\nPm 0.0\nTf 0.9 0.95 1.0\n"
        )


def _uv_sphere(cx, cy, cz, rx, ry, rz, nu=12, nv=8):
    verts = []
    faces = []
    for i in range(nv + 1):
        theta = np.pi * i / nv
        for j in range(nu):
            phi = 2 * np.pi * j / nu
            verts.append(
                (
                    cx + rx * np.sin(theta) * np.cos(phi),
                    cy + ry * np.cos(theta),
                    cz + rz * np.sin(theta) * np.sin(phi),
                )
            )
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + (j + 1) % nu
            d = (i + 1) * nu + j
            faces.append((a, b, c))
            faces.append((a, c, d))
    return verts, faces


def _write_obj(path, mtl_name, mtl_text, parts):
    """parts: list of (material, verts, faces)."""
    lines = [f"mtllib {mtl_name}"]
    offset = 0
    vchunks = []
    for material, verts, faces in parts:
        vchunks.append((material, verts, faces, offset))
        offset += len(verts)
    for _, verts, _, _ in vchunks:
        for v in verts:
            lines.append(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}")
    for material, verts, faces, off in vchunks:
        lines.append(f"usemtl {material}")
        for fidx in faces:
            a, b, c = (fidx[0] + off + 1, fidx[1] + off + 1, fidx[2] + off + 1)
            lines.append(f"f {a} {b} {c}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(os.path.dirname(path), mtl_name), "w") as f:
        f.write(mtl_text)


def write_bunny_obj(path: str) -> None:
    """Bunny-scaled blob (~1.2 units tall like the Stanford bunny usage)."""
    body_v, body_f = _uv_sphere(0, 0.45, 0, 0.55, 0.45, 0.45, 16, 10)
    head_v, head_f = _uv_sphere(0.35, 0.85, 0, 0.3, 0.28, 0.28, 12, 8)
    ear1_v, ear1_f = _uv_sphere(0.32, 1.25, -0.12, 0.08, 0.3, 0.06, 8, 6)
    ear2_v, ear2_f = _uv_sphere(0.32, 1.25, 0.12, 0.08, 0.3, 0.06, 8, 6)
    _write_obj(
        path,
        "bunny.mtl",
        "newmtl fur\nKd 0.73 0.70 0.65\nPr 0.9\nPm 0.0\n",
        [
            ("fur", body_v, body_f),
            ("fur", head_v, head_f),
            ("fur", ear1_v, ear1_f),
            ("fur", ear2_v, ear2_f),
        ],
    )


def _cone(cx, cy, cz, r, h, n=10):
    verts = [(cx, cy + h, cz)]
    for j in range(n):
        phi = 2 * np.pi * j / n
        verts.append((cx + r * np.cos(phi), cy, cz + r * np.sin(phi)))
    faces = []
    for j in range(n):
        faces.append((0, 1 + (j + 1) % n, 1 + j))
    return verts, faces


def _cylinder(cx, cy, cz, r, h, n=8):
    verts = []
    for j in range(n):
        phi = 2 * np.pi * j / n
        verts.append((cx + r * np.cos(phi), cy, cz + r * np.sin(phi)))
    for j in range(n):
        phi = 2 * np.pi * j / n
        verts.append((cx + r * np.cos(phi), cy + h, cz + r * np.sin(phi)))
    faces = []
    for j in range(n):
        a, b = j, (j + 1) % n
        faces.append((a, b, n + b))
        faces.append((a, n + b, n + a))
    return verts, faces


def write_pine_obj(path: str) -> None:
    """Conical pine ~9 units tall (tree meshes are ~8-10 units)."""
    trunk_v, trunk_f = _cylinder(0, 0, 0, 0.35, 3.0)
    c1_v, c1_f = _cone(0, 2.0, 0, 2.6, 4.0)
    c2_v, c2_f = _cone(0, 4.2, 0, 2.0, 3.2)
    c3_v, c3_f = _cone(0, 6.2, 0, 1.3, 2.6)
    _write_obj(
        path,
        "pine_tree.mtl",
        "newmtl bark\nKd 0.30 0.20 0.12\nPr 1.0\n"
        "newmtl needles\nKd 0.08 0.22 0.10\nPr 1.0\n",
        [
            ("bark", trunk_v, trunk_f),
            ("needles", c1_v, c1_f),
            ("needles", c2_v, c2_f),
            ("needles", c3_v, c3_f),
        ],
    )


def ensure_substitutes(gen_dir: str) -> dict:
    """Generates missing-asset substitutes; returns name->path mapping."""
    os.makedirs(gen_dir, exist_ok=True)
    out = {}
    specs = {
        "terrain": write_terrain_obj,
        "bunny": write_bunny_obj,
        "pine_tree": write_pine_obj,
    }
    for name, writer in specs.items():
        path = os.path.join(gen_dir, f"{name}.obj")
        if not os.path.exists(path):
            writer(path)
        out[name] = path
    return out
