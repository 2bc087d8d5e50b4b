#!/usr/bin/env python3
"""Production-config reference build + one-frame render (VERDICT r5 #5).

The reference's production settings (1920x1080 @ 1024 spp @ 5 bounces)
are selected by COMMENTING OUT `#define TESTING 1` in config.hh — the
file's own instruction ("For the final run on the real supercomputer,
comment out the following line", reference: config.hh:6). /root/reference
is read-only, so the tree is copied to build/refprod, the one line is
commented out in the copy, and the harness is compiled there with the
reference Makefile's own flags (-O3 -ffast-math -march=native,
Makefile:2) — the parity gate is PSNR, not bit-equality, so the fast
build's 2.6x speed is free.

    python tools/prod_harness.py --frame 0 --out build/prod
"""
import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("REFERENCE_DIR", "/root/reference")
BUILD = os.path.join(REPO, "build", "refprod")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_prod_harness() -> str:
    os.makedirs(BUILD, exist_ok=True)
    refcopy = os.path.join(BUILD, "ref")
    if not os.path.exists(os.path.join(refcopy, "config.hh")):
        os.makedirs(refcopy, exist_ok=True)
        for f in os.listdir(REF):
            src = os.path.join(REF, f)
            if os.path.isfile(src):
                shutil.copy(src, refcopy)
        cfg = os.path.join(refcopy, "config.hh")
        s = open(cfg).read()
        s = s.replace("#define TESTING 1",
                      "/* TESTING disabled: production build */")
        open(cfg, "w").write(s)
        assert "#define TESTING" not in s
    harness = os.path.join(BUILD, "harness")
    if not os.path.exists(harness):
        objs = []
        flags = ["-O3", "-ffast-math", "-march=native", "-std=c++17",
                 "-fopenmp", "-I" + refcopy]
        for srcf in ["mesh.cc", "bvh.cc", "scene.cc"]:
            obj = os.path.join(BUILD, srcf.replace(".cc", ".o"))
            subprocess.run(
                ["g++", *flags, "-c", os.path.join(refcopy, srcf),
                 "-o", obj], check=True)
            objs.append(obj)
        subprocess.run(
            ["g++", *flags,
             os.path.join(REPO, "tools", "oracle", "harness.cc"),
             *objs, "-o", harness], check=True)
    return harness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(REPO, "build", "prod"))
    args = ap.parse_args()

    from full_scene_parity import WORK, prepare_assets

    harness = build_prod_harness()
    prepare_assets()
    args.out = os.path.abspath(args.out)
    os.makedirs(args.out, exist_ok=True)
    gold = os.path.join(args.out, f"ref_prod_{args.frame:04d}.gold")
    if not os.path.exists(gold):
        import time

        t0 = time.perf_counter()
        subprocess.run(
            [harness, "animframe", WORK, str(args.frame), str(args.spp),
             gold],
            check=True,
            env=dict(os.environ, OMP_NUM_THREADS=str(os.cpu_count() or 4)),
        )
        print(f"reference production frame {args.frame}: "
              f"{time.perf_counter()-t0:.0f}s -> {gold}")
    else:
        print(f"exists: {gold}")


if __name__ == "__main__":
    main()
