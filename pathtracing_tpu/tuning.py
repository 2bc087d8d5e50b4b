"""Per-platform traversal tuning defaults, with a persisted tuned-file layer.

The traversal knobs (two-speed period, compaction divisor, entry-capable
cheap step, period unrolling, megakernel lanes/period/service) are pure
scheduling choices — results are bit-identical under all of them
(tests/test_traversal_twospeed.py, test_megakernel.py knob invariance) —
but their optima differ between backends: CPU is op-bound; on the v5e
every per-lane row gather costs ~3-10 ns regardless of width (the
corrected round-2 cost model, BENCH_NOTES.md — timing through the axon
tunnel must force a host fetch), so the optimum minimizes total gathered
rows and batches service work. ``ray_query`` resolves unset knobs through
this table, keyed by ``(platform, size_class)`` where size_class is
"large" for scenes above ops.traversal.LARGE_SCENE_NODES packed nodes.

Resolution order (first hit wins):
1. explicit ``ray_query(...)`` argument,
2. module override globals in ops/traversal.py (DEFAULT_LEAF_EVERY etc.,
   used by bench.py's PT_* env knobs and perf tooling),
3. the tuned file (``pathtracing_tpu/tuned.json`` or ``$PT_TUNED_FILE``),
   written by tools/tpu_session.py after an on-chip sweep,
4. the builtin table below (CPU-measured 2026-08-17; TPU rows start as
   copies of the CPU rows until a chip session updates the tuned file).
"""

from __future__ import annotations

import json
import os
import pathlib
from functools import lru_cache
from typing import Any

KNOBS = (
    "leaf_every", "compact_div", "mid_entry", "unroll", "tile_pixels",
    "mk_lanes", "mk_leaf_every", "mk_service_div", "wide_layout",
)

# Builtin fallbacks. CPU rows measured (BENCH_NOTES.md); any unknown
# platform falls back to the "cpu" rows.
BUILTIN: dict[str, dict[str, dict[str, Any]]] = {
    "cpu": {
        "small": {
            "leaf_every": 8,
            "compact_div": 4,
            "mid_entry": False,
            "unroll": False,
            "tile_pixels": 1 << 15,  # cache-bound optimum (BENCH_NOTES)
            "mk_lanes": 1 << 13,
            "mk_leaf_every": 4,
            "mk_service_div": 8,
            "wide_layout": "w8",
        },
        "large": {
            "leaf_every": 16,
            "compact_div": 8,
            "mid_entry": False,
            "unroll": False,
            "tile_pixels": 1 << 15,
            "mk_lanes": 1 << 13,
            "mk_leaf_every": 4,
            "mk_service_div": 8,
            "wide_layout": "w8",
        },
    },
    # TPU rows: "small" was swept ON CHIP with host-fetch timing
    # (2026-08-20, tools/mk_probe.py — see tuned.json, which overrides
    # these). The mk_* knobs for "large" were swept on chip in round 4
    # (tuned.json). The BINARY-WALK knobs for "large" (leaf_every /
    # compact_div / mid_entry / tile_pixels) are RETIRED as priors and
    # intentionally un-swept: on TPU the megakernel owns every large
    # scene (render.py auto-selects it; bench_suite/full frame loop use
    # it exclusively), so the binary walk never runs there. They only
    # matter if the megakernel is explicitly disabled; re-sweep with
    # tools/stress_probe.py --record if that ever becomes a real path.
    "tpu": {
        "small": {
            "leaf_every": 8,
            "compact_div": 4,
            "mid_entry": False,
            "unroll": True,
            # amortize per-iteration dispatch; compaction works better on
            # a larger population (prior, sweep on chip)
            "tile_pixels": 1 << 17,
            # megakernel optimum measured on v5e 2026-08-19 (golden scene
            # sweep, tools/mk_probe.py): 8192 lanes beats 32768 by 2.2x —
            # small populations keep every lane's chunk list long enough
            # to average horizon/sky work AND shrink the drain tail.
            "mk_lanes": 1 << 13,
            "mk_leaf_every": 4,
            "mk_service_div": 8,
            "wide_layout": "w8",
        },
        "large": {
            "leaf_every": 16,
            "compact_div": 8,
            "mid_entry": True,
            "unroll": True,
            "tile_pixels": 1 << 17,
            "mk_lanes": 1 << 13,
            "mk_leaf_every": 4,
            "mk_service_div": 8,
            "wide_layout": "w8",
        },
    },
}


def tuned_file_path() -> pathlib.Path:
    env = os.environ.get("PT_TUNED_FILE")
    if env:
        return pathlib.Path(env)
    return pathlib.Path(__file__).parent / "tuned.json"


@lru_cache(maxsize=None)
def _load_tuned(path_str: str, mtime: float) -> dict:
    try:
        with open(path_str) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _tuned() -> dict:
    p = tuned_file_path()
    try:
        mtime = p.stat().st_mtime
    except OSError:
        return {}
    return _load_tuned(str(p), mtime)


def get_tuning(platform: str, size_class: str) -> dict[str, Any]:
    """Merged knob dict for (platform, size_class).

    ``platform`` is a jax backend name ("cpu"/"tpu"/...); unknown platforms
    use the cpu rows. ``size_class`` is "small" or "large".
    """
    base = BUILTIN.get(platform, BUILTIN["cpu"]).get(size_class)
    if base is None:
        base = BUILTIN["cpu"]["small"]
    out = dict(base)
    tuned = _tuned().get(platform, {}).get(size_class, {})
    for k in KNOBS:
        if k in tuned:
            out[k] = tuned[k]
    return out


def record_tuning(platform: str, size_class: str, **knobs: Any) -> pathlib.Path:
    """Persist measured knob optima into the tuned file (read-modify-write;
    unknown knob names are rejected). Returns the file path."""
    bad = set(knobs) - set(KNOBS)
    if bad:
        raise ValueError(f"unknown knobs: {sorted(bad)}")
    p = tuned_file_path()
    data: dict = {}
    if p.exists():
        try:
            data = json.loads(p.read_text())
        except ValueError:
            data = {}
    data.setdefault(platform, {}).setdefault(size_class, {}).update(knobs)
    p.write_text(json.dumps(data, indent=2, sort_keys=True) + "\n")
    return p
