"""End-to-end parity vs the reference's OWN binary on the real animation.

tools/full_scene_parity.py compiles the reference's scene.cc unmodified,
feeds it the generated substitute assets, renders animation frames with its
own path_trace_pixel, and gates this framework's frames at >= 32 dB PSNR
(the reference validator's own bar). Runs as a subprocess so the tool's
TPU-probe/platform logic stays isolated from the test session.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("REFERENCE_DIR", "/root/reference")


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "data")),
    reason="reference tree not available",
)
def test_frame0_matches_reference_binary():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "full_scene_parity.py"),
         "--frames", "0", "--spp", "2", "--cpu"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PSNR" in r.stdout
