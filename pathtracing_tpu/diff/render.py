"""Differentiable (inverse) rendering.

The integrator is pure JAX, so reverse-mode AD flows end-to-end with one
carve-out: BVH traversal is discrete and runs under stop_gradient; the hit's
(u, v, t) are re-derived differentiably from the hit ids
(ops/integrator.trace_ray), giving fixed-topology gradients — the standard
"differentiable rendering w.r.t. materials/lights/vertices at fixed
visibility" model. Silhouette (visibility) gradients are out of scope and
documented as such.

Differentiable leaves of SceneDevice:
  vattr   — per-vertex normals, albedo, materials
  tri_pos — triangle vertex positions (shading + intersection re-derivation)
  inst_f  — instance transforms
  sf_cam / sf_light — per-subframe camera and sun parameters

Note nl8 only feeds the discrete traversal, so its cotangent is zero by
construction.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.config import RenderConfig
from pathtracing_tpu.ops.integrator import path_trace_samples
from pathtracing_tpu.utils.vec import Vec3

DIFFERENTIABLE_FIELDS = ("vattr", "tri_pos", "inst_f", "sf_cam", "sf_light")


def render_value_and_grad(
    config: RenderConfig,
    scene,
    xs,
    ys,
    sample_indices,
    loss_fn: Callable[[Vec3], jnp.ndarray] | None = None,
    fields: Sequence[str] = DIFFERENTIABLE_FIELDS,
):
    """Returns (loss, grads) where grads maps field name -> cotangent array.

    loss_fn maps the per-lane radiance Vec3 to a scalar; defaults to mean
    luminance. sample_indices: (R,) int32 — one sample per lane (average
    multiple calls for multi-spp gradients; samples are independent).
    """
    if loss_fn is None:
        def loss_fn(c):
            return jnp.mean(
                0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z
            )

    def forward(params):
        s = scene._replace(**params)
        c = path_trace_samples(config, s, xs, ys, sample_indices)
        return loss_fn(c)

    params = {f: getattr(scene, f) for f in fields}
    loss, grads = jax.value_and_grad(forward)(params)
    return loss, grads


def make_render_grad_fn(
    config: RenderConfig,
    fields: Sequence[str] = DIFFERENTIABLE_FIELDS,
    loss_fn: Callable[[Vec3], jnp.ndarray] | None = None,
):
    """Jittable (scene, xs, ys, sample_indices) -> (loss, grads)."""

    @jax.jit
    def fn(scene, xs, ys, sample_indices):
        return render_value_and_grad(
            config, scene, xs, ys, sample_indices, loss_fn, fields
        )

    return fn


def make_fast_grad_fn(
    config: RenderConfig,
    fields: Sequence[str] = DIFFERENTIABLE_FIELDS,
    loss_fn: Callable[[Vec3], jnp.ndarray] | None = None,
):
    """Record/replay gradients: the fast-path two-pass protocol.

    Pass 1 (no AD) runs the forward with the FAST traversal (the wide
    mega-table walk when the scene has wide tables) and records the hit
    topology per bounce. Pass 2 differentiates a REPLAY of the identical
    radiance computation in which every ray_query is replaced by a record
    lookup. Traversal already sat under stop_gradient in the slow path
    (fixed-topology gradient model, module docstring), so the gradients
    are identical — but the AD graph now contains no traversal at all:
    no per-step gathers, no while_loop transpose, and jax.checkpoint-free
    memory linear in bounces. Returns a jitted
    (scene, xs, ys, sample_indices) -> (loss, grads) like
    make_render_grad_fn.
    """
    if loss_fn is None:
        def loss_fn(c):
            return jnp.mean(0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z)

    @jax.jit
    def fn(scene, xs, ys, sample_indices):
        sg = jax.tree.map(jax.lax.stop_gradient, scene)
        _, records = path_trace_samples(
            config, sg, xs, ys, sample_indices, record=True
        )

        def forward(params):
            s = scene._replace(**params)
            c = path_trace_samples(
                config, s, xs, ys, sample_indices, replay=records
            )
            return loss_fn(c)

        params = {f: getattr(scene, f) for f in fields}
        return jax.value_and_grad(forward)(params)

    return fn


def make_fast_grad_frame_fn(
    config: RenderConfig,
    n_pixels: int,
    spp: int,
    fields: Sequence[str] = DIFFERENTIABLE_FIELDS,
    loss_fn: Callable[[Vec3], jnp.ndarray] | None = None,
    lanes: int = 8192,
    sample_base: int = 0,
    leaf_every: int | None = None,
    service_div: int | None = None,
):
    """Frame-structured record/replay gradients at MEGAKERNEL speed.

    Like make_fast_grad_fn, but pass 1 records hit topology inside the
    persistent-lane megakernel (ops/megakernel.py record=True) over the
    row-major pixels [0, n_pixels) x samples [sample_base,
    sample_base+spp) — the fast-grad decomposition showed the scan-forward
    record pass binds (BENCH_NOTES round 4), and the megakernel runs the
    same forward ~8x faster on small scenes. Pass 2 differentiates the
    traversal-free scan replay over one lane per (pixel, sample) work
    item. Returns a jitted fn(scene) -> (loss, grads). Requires wide
    tables; sun-NEE scenes only (megakernel record constraint)."""
    from pathtracing_tpu.ops.megakernel import path_trace_megakernel

    if loss_fn is None:
        def loss_fn(c):
            return jnp.mean(0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z)

    n_items = n_pixels * spp
    item = np.arange(n_items, dtype=np.int32)
    pix = item % n_pixels

    @jax.jit
    def fn(scene):
        xs = jnp.asarray(pix % config.image_width)
        ys = jnp.asarray(pix // config.image_width)
        si = jnp.asarray(sample_base + item // n_pixels)
        sg = jax.tree.map(jax.lax.stop_gradient, scene)
        mk_kw = {}
        if leaf_every is not None:
            mk_kw["leaf_every"] = leaf_every
        if service_div is not None:
            mk_kw["service_div"] = service_div
        _, records = path_trace_megakernel(
            config, sg, n_pixels, spp, sample_base, lanes=lanes,
            record=True, **mk_kw,
        )

        def forward(params):
            s = scene._replace(**params)
            c = path_trace_samples(config, s, xs, ys, si, replay=records)
            return loss_fn(c)

        params = {f: getattr(scene, f) for f in fields}
        return jax.value_and_grad(forward)(params)

    return fn
