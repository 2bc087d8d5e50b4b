"""Kernel-level BSDF goldens: bsdf() eval and sample_bsdf() vs the oracle
over 2048 deterministic material/direction/RNG cases
(reference: path_tracer.hh:184-296)."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracing_tpu.ops.bsdf import bsdf_eval, sample_bsdf
from pathtracing_tpu.utils.goldenio import load_golden
from pathtracing_tpu.utils.vec import Vec3

from conftest import require_golden


def _inputs():
    g = load_golden(str(require_golden("bsdf.gold")))
    i = g["inputs"]
    light = Vec3(*(jnp.asarray(i[:, k]) for k in range(0, 3)))
    view = Vec3(*(jnp.asarray(i[:, k]) for k in range(3, 6)))
    albedo = Vec3(*(jnp.asarray(i[:, k]) for k in range(6, 9)))
    rough, metal, trans, eta = (jnp.asarray(i[:, k]) for k in range(9, 13))
    u = Vec3(*(jnp.asarray(i[:, k]) for k in range(13, 16)))
    return g, light, view, albedo, rough, metal, trans, eta, u


def test_bsdf_eval_matches_oracle():
    g, light, view, albedo, rough, metal, trans, eta, u = _inputs()
    color, pdf = jax.jit(bsdf_eval)(
        light, view, albedo, rough, metal, trans, eta
    )
    got = np.stack(
        [np.asarray(color.x), np.asarray(color.y), np.asarray(color.z), np.asarray(pdf)],
        -1,
    )
    ref = g["eval"]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-5)
    assert np.quantile(rel, 0.999) < 1e-3, np.quantile(rel, 0.999)
    assert np.median(rel) < 1e-5


def test_sample_bsdf_matches_oracle():
    g, light, view, albedo, rough, metal, trans, eta, u = _inputs()
    s = jax.jit(sample_bsdf)(u, view, albedo, rough, metal, trans, eta)
    got = np.stack(
        [
            np.asarray(s.direction.x), np.asarray(s.direction.y), np.asarray(s.direction.z),
            np.asarray(s.attenuation.x), np.asarray(s.attenuation.y), np.asarray(s.attenuation.z),
            np.asarray(s.pdf),
        ],
        -1,
    )
    ref = g["sample"]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-5)
    # lobe selection at probability boundaries can flip on transcendental
    # ulps; almost all cases must match tightly
    assert np.quantile(rel, 0.995) < 1e-3, np.quantile(rel, 0.995)
    assert np.median(rel) < 1e-5
