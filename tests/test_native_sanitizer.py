"""ASan/UBSan build of the native BVH builder (SURVEY.md section 5: the
reference ships no sanitizer targets; our host-side C++ gets one).

Compiles tools/native_sanity.cc + accel/native/bvh_builder.cc with
-fsanitize=address,undefined and runs the harness: degenerate inputs, tie
cases, a large random cloud, and the cap-overflow path. Any heap error or
UB aborts the binary."""

import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_builder_under_asan_ubsan(tmp_path):
    exe = tmp_path / "native_sanity"
    compile_cmd = [
        "g++", "-O1", "-g", "-std=c++17",
        "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
        str(REPO / "tools" / "native_sanity.cc"),
        str(REPO / "pathtracing_tpu" / "accel" / "native" / "bvh_builder.cc"),
        "-o", str(exe),
    ]
    cc = subprocess.run(compile_cmd, capture_output=True, text=True)
    if cc.returncode != 0:
        pytest.skip(f"sanitizer toolchain unavailable: {cc.stderr[-300:]}")
    run = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=120
    )
    assert run.returncode == 0, run.stdout + run.stderr
    assert "all clean" in run.stdout
