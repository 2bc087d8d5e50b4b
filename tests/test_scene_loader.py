"""Full-scene loader + animation: determinism, structure, animation quirks."""

import dataclasses

import numpy as np
import pytest

from pathtracing_tpu.config import TESTING
from pathtracing_tpu.scene.animation import (
    initial_frame_state,
    play_animation_track,
)

CFG = dataclasses.replace(TESTING, samples_per_pixel=16)  # 2 subframes


@pytest.fixture(scope="module")
def scene():
    from pathtracing_tpu.scene.loader import load_scene

    return load_scene(config=CFG)


def test_load_scene_structure(scene):
    # 18 meshes, deterministic placement on the substitute terrain
    assert len(scene.meshes) == 18
    assert scene.static_instance_count > 300
    assert len(scene.bvh_buf.links) == 8 * len(scene.bvh_buf.nodes)
    # terrain recolor: non-water vertices follow the height gradients
    alb = scene.mesh_buf.albedo[0]
    mat = scene.mesh_buf.material[0]
    land = mat[:, 2] == 0
    assert land.any() and (~land).any()  # terrain has land and water
    assert (alb[land][:, 3] == 1.0).all()  # gradient alpha = 1


def test_placement_deterministic(scene):
    from pathtracing_tpu.scene.loader import load_scene

    s2 = load_scene(config=CFG)
    assert len(s2.instances) == len(scene.instances)
    for a, b in zip(scene.instances, s2.instances):
        np.testing.assert_array_equal(a.transform, b.transform)


def test_setup_animation_frame(scene):
    from pathtracing_tpu.scene.loader import setup_animation_frame

    setup_animation_frame(scene, 0, CFG)
    assert len(scene.subframes) == CFG.subframe_count
    n_after_0 = len(scene.instances)
    nodes_after_0 = len(scene.bvh_buf.nodes)

    # frame 400: teapot+armadillo visible; camera moved by the track
    setup_animation_frame(scene, 400, CFG)
    assert len(scene.instances) == scene.static_instance_count + 1 + 2 * CFG.subframe_count
    cam = scene.subframes[0].cam
    np.testing.assert_allclose(cam.position, [38.5, 19.2, 37.7], atol=1e-4)

    # frame loop re-entry keeps buffers balanced (pop works)
    setup_animation_frame(scene, 0, CFG)
    assert len(scene.instances) == n_after_0
    assert len(scene.bvh_buf.nodes) == nodes_after_0
    assert len(scene.bvh_buf.links) == 8 * len(scene.bvh_buf.nodes)


def test_animation_track_quirks():
    # later stops override earlier ones; iteration breaks at first start > t
    state = initial_frame_state()
    play_animation_track(state, 1104.5)
    # the (1104, ...) entries sit AFTER (1105, ...) in the table, so at
    # t=1104.5 the scan stops at 1105 and bunny_pos_x keeps its 980 value
    assert state["bunny_pos_x"] == np.float32(-34.5)
    state = initial_frame_state()
    play_animation_track(state, 1106.0)
    # now the 1105 entry passes and the 1104 entries apply (fully elapsed at
    # t>=1109; at 1106 it lerps 2/5 of the way)
    np.testing.assert_allclose(
        state["bunny_pos_x"], -34.5 + ((-25.5) - (-34.5)) * (2.0 / 5.0), rtol=1e-6
    )

    # snap stops (duration 0)
    state = initial_frame_state()
    play_animation_track(state, 140.0)
    assert state["cam_pos_x"] == np.float32(-11.6)
    # teapot zoom overrides the 60..120 camera move applied earlier in order
    play_animation_track(state, 139.9)
    assert state["cam_pos_x"] == np.float32(-90.6)


def test_sun_below_horizon_at_sunset_end(scene):
    from pathtracing_tpu.scene.loader import setup_animation_frame

    setup_animation_frame(scene, 1799, CFG)
    # sunset curve: sun is low/below horizon at the end (scene.cc:691-693)
    assert scene.subframes[-1].light.direction[1] < 0.1


def test_device_packer_matches_pack_scene(scene):
    import jax.numpy as jnp

    from pathtracing_tpu.scene.device import DevicePacker, pack_scene
    from pathtracing_tpu.scene.loader import setup_animation_frame

    packer = DevicePacker(scene)
    setup_animation_frame(scene, 10, CFG)
    a = packer.pack_frame(scene)
    b = pack_scene(
        scene.mesh_buf.arrays(),
        scene.bvh_buf.nodes,
        scene.bvh_buf.links,
        scene.instances,
        scene.subframes,
    )
    for name in a._fields:
        fa, fb = getattr(a, name), getattr(b, name)
        if fa is None and fb is None:
            continue
        av, bv = np.asarray(fa), np.asarray(fb)
        if name in ("tri_pos", "tri_idx", "nl8", "inst_f", "inst_u"):
            # packer covers ALL meshes / BLASes and pads tails/instances to
            # shape-stable buckets; pack_scene only fills instanced rows —
            # every row pack_scene filled must match, pad rows must be zero
            mask = np.any(bv != 0, axis=tuple(range(1, bv.ndim))) if bv.ndim > 1 else bv != 0
            np.testing.assert_array_equal(av[: len(bv)][mask], bv[mask], err_msg=name)
            if name in ("inst_f", "inst_u"):
                assert not np.any(av[len(bv):]), f"{name}: nonzero pad rows"
        else:
            np.testing.assert_array_equal(av, bv, err_msg=name)


def test_subframe_grid_follows_config_not_rendered_spp(scene):
    """The motion-blur subframe time grid is fixed by the CONFIG's
    samples_per_pixel — the reference's is compile-time (256 => 32
    subframes at times i/32, config.hh:14-18, scene.cc:648-650) no matter
    how many samples a render draws. Harnesses must therefore render
    sample subsets against the FULL grid (tools/full_validation.py);
    rescaling the grid to the rendered spp diverges above 8 spp (the
    round-4 64-spp validation caught exactly this: 7/18 frames < 32 dB).
    Pinned here at the data level: TESTING builds 32 subframes and the
    per-subframe dynamic instances sit at distinct times."""
    from pathtracing_tpu.scene.loader import setup_animation_frame

    assert TESTING.samples_per_pixel == 256
    assert TESTING.subframe_count == 32

    setup_animation_frame(scene, 500, TESTING)
    try:
        assert len(scene.subframes) == 32
        assert len(scene.subframe_entries) == 32
        # the sunset curve is continuous in sub_t, so the 32 grid
        # points carry 32 distinct sun directions at every frame
        # (reference: scene.cc:691-693) — subframe times are i/32 of
        # the frame interval, not i/ceil(rendered_spp/8)
        dirs = {tuple(sf.light.direction.tolist())
                for sf in scene.subframes}
        assert len(dirs) == 32, len(dirs)
    finally:
        # restore the module fixture's 2-subframe frame state
        setup_animation_frame(scene, 1, CFG)


def test_skip_tlas_trees_same_wide_tables(scene):
    """build_tlas_trees=False (the wide-path frame loop's fast setup) must
    yield byte-identical chunked wide tables and per-subframe root
    cursors — the chunked tail is built from the instance list alone and
    uses sf.tlas.node_offset only as a row key."""
    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import setup_animation_frame

    packer = DevicePacker(scene, wide=True, chunk_max=512)
    try:
        setup_animation_frame(scene, 42, CFG)
        dev_a = packer.pack_frame(scene)
        roots_a = [
            np.asarray(
                dev_a.wide_root[sf.tlas.node_offset - int(dev_a.wide_root_base)]
            )
            for sf in scene.subframes
        ]
        wide_a = np.asarray(dev_a.wide_rows)

        setup_animation_frame(scene, 42, CFG, build_tlas_trees=False)
        assert all(sf.tlas.node_count == 0 for sf in scene.subframes)
        dev_b = packer.pack_frame(scene)
        roots_b = [
            np.asarray(
                dev_b.wide_root[sf.tlas.node_offset - int(dev_b.wide_root_base)]
            )
            for sf in scene.subframes
        ]
        np.testing.assert_array_equal(wide_a, np.asarray(dev_b.wide_rows))
        for a, b in zip(roots_a, roots_b):
            np.testing.assert_array_equal(a, b)
    finally:
        setup_animation_frame(scene, 1, CFG)
