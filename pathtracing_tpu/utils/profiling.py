"""Tracing / metrics (SURVEY.md §5).

The reference's only instrumentation is std::chrono prints
(reference: main.cc:65-105). Here:

  * ``trace_to(dir)`` — context manager around jax.profiler for
    Perfetto-compatible device traces.
  * ``MetricsLog`` — structured JSON-lines per-frame metrics
    (samples/s, rays upper bound, stage timings), the machine-readable
    counterpart of the CLI's human prints.
"""

from __future__ import annotations

import contextlib
import json
import time


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    def __init__(self, path: str | None):
        self._path = path
        self._f = open(path, "a") if path else None

    def log(self, **fields):
        fields.setdefault("t", time.time())
        if self._f:
            self._f.write(json.dumps(fields) + "\n")
            self._f.flush()
        return fields

    def frame(
        self,
        frame_index: int,
        setup_s: float,
        render_s: float,
        n_samples: int,
        max_bounces: int,
    ):
        # <=1 primary + bounces*(1 closest + 1 shadow) queries per sample
        rays_upper = n_samples * (1 + 2 * max_bounces)
        return self.log(
            kind="frame",
            frame=frame_index,
            setup_ms=round(setup_s * 1e3, 1),
            render_ms=round(render_s * 1e3, 1),
            msamples_per_s=round(n_samples / render_s / 1e6, 4),
            mrays_per_s_upper=round(rays_upper / render_s / 1e6, 4),
        )

    def close(self):
        if self._f:
            self._f.close()
