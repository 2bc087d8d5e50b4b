"""pathtracing_tpu — a TPU-native differentiable path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU path tracer (``Path-Tracing...but-on-the-LUMI-cluster``): watertight
ray-triangle intersection, stackless two-level BVH traversal, a physically
based BSDF integrator with NEE/MIS, a Nishita single-scattering sky, motion
blur, the full hard-coded 60 s animation, and a bit-faithful counter-based
RNG — all expressed as batched structure-of-arrays compute that XLA maps onto
the TPU vector unit, sharded over device meshes with ``shard_map``.

Layering (mirrors SURVEY.md §1, redesigned TPU-first):
  utils/   host+device math helpers (SoA vec3, mat3/4, RNG)
  io/      OBJ/MTL loading, BMP output
  accel/   host-side SAH BVH build (BLAS/TLAS), flattened TPU-friendly layout
  ops/     device kernels: traversal, BSDF, sky, camera, integrator, tonemap
  scene/   scene assembly, deterministic placement, animation tracks
  parallel/ device-mesh sharding of the render loop
  render.py  frame-loop driver
"""

__version__ = "0.1.0"


__all__ = [
    "RenderConfig",
    "TESTING",
    "PRODUCTION",
    "SceneBuilder",
    "render_frame",
    "render_pixels",
    "load_scene",
    "setup_animation_frame",
    "write_bmp",
]


def __getattr__(name):
    """Lazy top-level API (keeps `import pathtracing_tpu` jax-free)."""
    if name in ("RenderConfig", "TESTING", "PRODUCTION"):
        from pathtracing_tpu import config

        return getattr(config, name)
    if name == "SceneBuilder":
        from pathtracing_tpu.scene.builder import SceneBuilder

        return SceneBuilder
    if name in ("render_frame", "render_pixels"):
        from pathtracing_tpu import render

        return getattr(render, name)
    if name in ("load_scene", "setup_animation_frame"):
        from pathtracing_tpu.scene import loader

        return getattr(loader, name)
    if name == "write_bmp":
        from pathtracing_tpu.io.bmp import write_bmp

        return write_bmp
    raise AttributeError(name)
