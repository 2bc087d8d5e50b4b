"""Per-platform tuning table: builtin rows, tuned-file overrides, recording."""

import json

import pytest

from pathtracing_tpu import tuning


@pytest.fixture
def tuned_file(tmp_path, monkeypatch):
    p = tmp_path / "tuned.json"
    monkeypatch.setenv("PT_TUNED_FILE", str(p))
    return p


def test_builtin_rows(tuned_file):
    cpu_small = tuning.get_tuning("cpu", "small")
    assert cpu_small["leaf_every"] == 8
    assert cpu_small["compact_div"] == 4
    cpu_large = tuning.get_tuning("cpu", "large")
    assert cpu_large["leaf_every"] == 16
    assert cpu_large["compact_div"] == 8
    # unknown platform falls back to cpu rows
    assert tuning.get_tuning("quantum", "large") == cpu_large


def test_record_and_override(tuned_file):
    tuning.record_tuning("tpu", "small", leaf_every=12, unroll=True)
    got = tuning.get_tuning("tpu", "small")
    assert got["leaf_every"] == 12
    assert got["unroll"] is True
    # untouched knobs keep builtin values
    assert got["compact_div"] == tuning.BUILTIN["tpu"]["small"]["compact_div"]
    # other rows unaffected
    assert tuning.get_tuning("tpu", "large") == tuning.BUILTIN["tpu"]["large"]

    # read-modify-write preserves earlier entries
    tuning.record_tuning("tpu", "large", mid_entry=True)
    data = json.loads(tuned_file.read_text())
    assert data["tpu"]["small"]["leaf_every"] == 12
    assert data["tpu"]["large"]["mid_entry"] is True
    assert tuning.get_tuning("tpu", "small")["leaf_every"] == 12


def test_reject_unknown_knob(tuned_file):
    with pytest.raises(ValueError):
        tuning.record_tuning("tpu", "small", warp_factor=9)


def test_corrupt_file_falls_back(tuned_file):
    tuned_file.write_text("{not json")
    assert tuning.get_tuning("cpu", "small") == tuning.BUILTIN["cpu"]["small"]


def test_ray_query_consults_table(tuned_file, golden_dir):
    """An absurd tuned row must actually change the compiled program: a
    leaf_every above the step count with compaction disabled behaves like
    the one-speed loop bitwise, so instead we check resolution by spying on
    get_tuning through the traversal module."""
    import jax.numpy as jnp
    import numpy as np

    from pathtracing_tpu.ops import traversal
    from pathtracing_tpu.utils.goldenio import load_golden
    from pathtracing_tpu.utils.vec import Vec3
    from golden_scene import scene_device_from_golden

    tuning.record_tuning("cpu", "small", leaf_every=6, unroll=True)

    calls = []
    orig = traversal._get_tuning

    def spy(platform, size):
        calls.append((platform, size))
        return orig(platform, size)

    traversal._get_tuning = spy
    try:
        sg = load_golden(str(golden_dir / "scene.gold"))
        rg = load_golden(str(golden_dir / "rays.gold"))
        scene = scene_device_from_golden(sg)
        R = 64
        tlc = jnp.full(R, int(sg["tlas"][0]), jnp.int32)
        tlo = jnp.full(R, int(sg["tlas"][1]), jnp.int32)
        org = Vec3(*(jnp.asarray(rg["origins"][:R, i]) for i in range(3)))
        d = Vec3(*(jnp.asarray(rg["dirs"][:R, i]) for i in range(3)))
        hit, _ = traversal.ray_query(
            scene, tlc, tlo, org, d, 0.0, 1e9, jnp.ones(R, bool)
        )
        assert np.asarray(hit.thit).shape == (R,)
    finally:
        traversal._get_tuning = orig
    assert ("cpu", "small") in calls
