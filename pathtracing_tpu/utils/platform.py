"""Backend selection that survives a wedged TPU tunnel.

Importing jax and touching any backend while the axon tunnel is down either
hangs forever (sleep-polling PJRT init) or raises RuntimeError — so the
only safe probe is a THROWAWAY SUBPROCESS with a timeout (see CLAUDE.md).
Call ensure_backend() before the first jax backend touch.
"""

from __future__ import annotations

import subprocess
import sys


def tpu_alive(timeout_s: int = 120) -> bool:
    """Probe the default (TPU) backend in a subprocess."""
    try:
        return (
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "jnp.arange(4.0).sum().block_until_ready()"],
                timeout=timeout_s, capture_output=True,
            ).returncode == 0
        )
    except subprocess.TimeoutExpired:
        return False


def ensure_backend(prefer_tpu: bool = True, timeout_s: int = 120) -> str:
    """Returns "tpu" or "cpu"; forces the CPU platform when the TPU is
    unreachable. Must be called before jax initializes any backend."""
    import jax

    if prefer_tpu and tpu_alive(timeout_s):
        return "tpu"
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
