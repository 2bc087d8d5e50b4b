"""Scene-preset zoo (pathtracing_tpu/models): every procedural preset
builds through the public SceneBuilder pipeline and renders finite,
plausibly-lit radiance. full_animation is exercised end-to-end by
tests/test_full_scene_parity.py and tests/test_scene_loader.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracing_tpu import models
from pathtracing_tpu.config import TESTING
from pathtracing_tpu.render import render_pixels


def test_registry():
    assert models.names() == [
        "cornell_box", "full_animation", "sphere_ground", "teapot_rocks",
    ]
    with pytest.raises(KeyError):
        models.build("nope")


@pytest.mark.parametrize("name", ["cornell_box", "sphere_ground", "teapot_rocks"])
def test_preset_renders(name):
    scene, dev = models.build(name, TESTING)
    assert scene.static_instance_count == len(scene.instances)
    rng = np.random.default_rng(1)
    n = 256
    xs = jnp.asarray(rng.integers(0, TESTING.image_width, n), jnp.int32)
    ys = jnp.asarray(rng.integers(0, TESTING.image_height, n), jnp.int32)
    img = np.asarray(render_pixels(TESTING, dev, xs, ys, spp=2))
    assert np.isfinite(img).all()
    lit = float((img.sum(-1) > 1e-4).mean())
    if name == "cornell_box":
        # no sun, no sky: the emissive ceiling panel is the only light;
        # area-light NEE (on by default) lights most interior pixels
        assert float(img.max()) > 1.0
        assert lit > 0.2
    else:
        assert lit > 0.5
        assert 0.01 < float(img.mean()) < 10.0
