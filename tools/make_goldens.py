#!/usr/bin/env python3
"""Build the C++ oracle harness against the read-only reference tree and
(re)generate the golden files under tests/golden/.

Run once per environment (requires /root/reference and g++):
    python tools/make_goldens.py [--all]

The goldens are committed, so CI/tests do not need the reference tree.
The oracle is compiled WITHOUT -ffast-math so its float arithmetic is
IEEE-deterministic (the reference's own Makefile uses -ffast-math, which is
why the gate against the reference's committed frames is PSNR, not bits).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("REFERENCE_DIR", "/root/reference")
BUILD = os.path.join(REPO, "build", "oracle")
GOLD = os.path.join(REPO, "tests", "golden")
ASSETS = os.path.join(REPO, "assets", "golden")

GROUND_OBJ = """\
mtllib ground.mtl
v -60 0 -60
v 60 0 -60
v 60 0 60
v -60 0 60
vn 0 1 0
usemtl ground
f 1//1 2//1 3//1
f 1//1 3//1 4//1
"""

GROUND_MTL = """\
newmtl ground
Kd 0.40 0.36 0.30
Pr 0.90
Pm 0.00
"""


def run(cmd, **kw):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, **kw)


def build_oracle() -> str:
    os.makedirs(BUILD, exist_ok=True)
    objs = []
    for src in ["mesh.cc", "bvh.cc", "scene.cc"]:
        obj = os.path.join(BUILD, src.replace(".cc", ".o"))
        if not os.path.exists(obj) or os.path.getmtime(obj) < os.path.getmtime(
            os.path.join(REF, src)
        ):
            run(
                [
                    "g++", "-O2", "-std=c++17", "-fopenmp", "-ffp-contract=off", "-I" + REF,
                    "-c", os.path.join(REF, src), "-o", obj,
                ]
            )
        objs.append(obj)
    harness = os.path.join(BUILD, "harness")
    src = os.path.join(REPO, "tools", "oracle", "harness.cc")
    if not os.path.exists(harness) or os.path.getmtime(harness) < os.path.getmtime(src):
        run(
            [
                "g++", "-O2", "-std=c++17", "-fopenmp", "-ffp-contract=off", "-I" + REF,
                src, *objs, "-o", harness,
            ]
        )
    return harness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--render-spp", type=int, default=8)
    ap.add_argument("--skip-render", action="store_true")
    args = ap.parse_args()

    os.makedirs(GOLD, exist_ok=True)
    os.makedirs(ASSETS, exist_ok=True)
    with open(os.path.join(ASSETS, "ground.obj"), "w") as f:
        f.write(GROUND_OBJ)
    with open(os.path.join(ASSETS, "ground.mtl"), "w") as f:
        f.write(GROUND_MTL)

    harness = build_oracle()
    data = os.path.join(REF, "data")
    ground = os.path.join(ASSETS, "ground.obj")

    run([harness, "rng", os.path.join(GOLD, "rng.gold")])
    run([harness, "bsdf", os.path.join(GOLD, "bsdf.gold")])
    run([harness, "motion", data, ground, os.path.join(GOLD, "motion.gold")])
    run([harness, "mesh", os.path.join(data, "teapot.obj"), os.path.join(GOLD, "mesh_teapot.gold")])
    run([harness, "mesh", os.path.join(data, "rock2.obj"), os.path.join(GOLD, "mesh_rock2.gold")])
    run([harness, "blas", os.path.join(data, "rock0.obj"), os.path.join(GOLD, "blas_rock0.gold")])
    run([harness, "blas", os.path.join(data, "teapot.obj"), os.path.join(GOLD, "blas_teapot.gold")])
    run([harness, "scene", data, ground, os.path.join(GOLD, "scene.gold")])
    run([harness, "rays", data, ground, os.path.join(GOLD, "rays.gold"), "4096"])
    run([harness, "trace", data, ground, os.path.join(GOLD, "trace.gold"), "40", "40", "4"])
    if not args.skip_render:
        run([
            harness, "render", data, ground,
            os.path.join(GOLD, f"render{args.render_spp}.gold"),
            str(args.render_spp),
        ])
    print("goldens written to", GOLD)


if __name__ == "__main__":
    sys.exit(main())
