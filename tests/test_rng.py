"""PCG4D must match the reference bit-for-bit (reference: math.hh:466-485).

The RNG is the bit-faithfulness linchpin: every sample's entire path is
derived from it, and the conditional-draw ordering means one mismatch
desynchronizes everything downstream (SURVEY.md §3.2).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracing_tpu.ops import rng
from pathtracing_tpu.utils.goldenio import load_golden

from conftest import require_golden


def _load():
    return load_golden(str(require_golden("rng.gold")))


def test_pcg4d_states_numpy():
    g = _load()
    seeds, states = g["seeds"], g["states"]
    s = rng.Seed(*(seeds[:, i].copy() for i in range(4)))
    for j in range(states.shape[1]):
        s = rng.pcg4d(s)
        got = np.stack([s.x, s.y, s.z, s.w], axis=-1)
        np.testing.assert_array_equal(got, states[:, j], err_msg=f"step {j}")


def test_pcg4d_states_jax():
    g = _load()
    seeds, states = g["seeds"], g["states"]
    s = rng.Seed(*(jnp.asarray(seeds[:, i]) for i in range(4)))
    step = jax.jit(rng.pcg4d)
    for j in range(states.shape[1]):
        s = step(s)
        got = np.stack([np.asarray(s.x), np.asarray(s.y), np.asarray(s.z), np.asarray(s.w)], axis=-1)
        np.testing.assert_array_equal(got, states[:, j], err_msg=f"step {j}")


def test_uniform4_bitexact():
    g = _load()
    seeds, uniforms = g["seeds"], g["uniforms"]
    s = rng.Seed(*(jnp.asarray(seeds[:, i]) for i in range(4)))
    draw = jax.jit(rng.uniform4)
    for j in range(uniforms.shape[1]):
        s, u = draw(s)
        got = np.stack([np.asarray(u.x), np.asarray(u.y), np.asarray(u.z), np.asarray(u.w)], axis=-1)
        np.testing.assert_array_equal(got, uniforms[:, j], err_msg=f"step {j}")


def test_uniform4_masked_consumption():
    # Masked lanes keep their state; unmasked lanes advance exactly one step.
    g = _load()
    seeds = g["seeds"]
    s0 = rng.Seed(*(jnp.asarray(seeds[:, i]) for i in range(4)))
    consume = jnp.asarray([True, False, True, False, True, False])
    s1, _ = rng.uniform4_masked(s0, consume)
    ref = rng.pcg4d(rng.Seed(*(seeds[:, i].copy() for i in range(4))))
    for lane in range(6):
        for c, (a, b0, b1) in enumerate(zip(ref, s0, s1)):
            expected = a[lane] if consume[lane] else np.asarray(b0)[lane]
            assert np.asarray(b1)[lane] == expected, (lane, c)
