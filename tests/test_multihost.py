"""Multi-process multi-host layer (parallel/multihost.py).

Runs tools/multihost_demo.py: two real processes, each its own jax
"host" with 2 CPU devices, jax.distributed.initialize against a local
coordinator, a cross-process psum over the global mesh, round-robin
frame assignment, and byte-identical composed frame output.
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).parent.parent


def test_two_process_demo(tmp_path):
    # drop the suite's own XLA/JAX platform settings — the demo workers
    # configure their own device counts
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
         "--size", "64x36", "--spp", "2", "--frames", "4",
         "--out", str(tmp_path)],
        timeout=900, capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "byte-identical" in r.stdout
    for f in range(4):
        assert (tmp_path / f"frame_{f:04d}.bmp").exists()
