"""Bit-faithful PCG4D counter-based RNG (reference: math.hh:466-485).

The seed layout is ``{pixel_x, pixel_y, sample_index, STUDENT_ID}`` with one
warm-up step (reference: path_tracer.hh:659-660). Every sample owns an
independent counter, so samples shard freely across devices — the RNG *is*
the parallelism contract of this renderer.

State is four uint32 component arrays (SoA), matching utils.vec. All
arithmetic wraps mod 2^32 in both numpy and jax.numpy, so the same code runs
host-side (deterministic object placement, reference: scene.cc:191) and
device-side.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np

from pathtracing_tpu.utils.vec import Vec4

Array = Any

_MUL = np.uint32(1664525)
_ADD = np.uint32(1013904223)
_U2F = np.float32(2.3283064365386963e-10)  # 1/2^32 (reference: math.hh:484)


class Seed(NamedTuple):
    """uint4 RNG state; a JAX pytree of four uint32 arrays."""

    x: Array
    y: Array
    z: Array
    w: Array


def make_seed(x, y, z, w) -> Seed:
    return Seed(x, y, z, w)


def pcg4d(s: Seed) -> Seed:
    """One PCG4D step; returns the new state (= the uint4 output).

    reference: math.hh:466-473 — LCG, simultaneous cross multiply-add,
    xorshift 16, second cross multiply-add.
    """
    x = s.x * _MUL + _ADD
    y = s.y * _MUL + _ADD
    z = s.z * _MUL + _ADD
    w = s.w * _MUL + _ADD
    # seed += seed.yzxy * seed.wxyz  (simultaneous)
    x, y, z, w = x + y * w, y + z * x, z + x * y, w + y * z
    x = x ^ (x >> np.uint32(16))
    y = y ^ (y >> np.uint32(16))
    z = z ^ (z >> np.uint32(16))
    w = w ^ (w >> np.uint32(16))
    x, y, z, w = x + y * w, y + z * x, z + x * y, w + y * z
    return Seed(x, y, z, w)


def _to_f32(v) -> Array:
    # (float)uint32 then * 2^-32, matching C's conversion+scale
    # (reference: math.hh:477-484).
    return v.astype(np.float32) * _U2F


def uniform4(s: Seed) -> tuple[Seed, Vec4]:
    """generate_uniform_random4 (reference: math.hh:475-485).

    Returns (new_state, float4 in [0,1)).
    """
    s = pcg4d(s)
    return s, Vec4(_to_f32(s.x), _to_f32(s.y), _to_f32(s.z), _to_f32(s.w))


def uniform4_masked(s: Seed, consume) -> tuple[Seed, Vec4]:
    """Per-lane conditional draw.

    Lanes where ``consume`` is False keep their previous state and their
    returned values are unspecified. This replicates the reference's
    *conditional* RNG consumption (the atmosphere early-outs at
    path_tracer.hh:513-525 skip the draw on some paths, desynchronizing
    naive ports).
    """
    import jax.numpy as jnp

    nxt = pcg4d(s)
    out = Seed(
        jnp.where(consume, nxt.x, s.x),
        jnp.where(consume, nxt.y, s.y),
        jnp.where(consume, nxt.z, s.z),
        jnp.where(consume, nxt.w, s.w),
    )
    return out, Vec4(_to_f32(nxt.x), _to_f32(nxt.y), _to_f32(nxt.z), _to_f32(nxt.w))
