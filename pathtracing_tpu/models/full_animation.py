"""The reference's full animated scene — the flagship model.

Thin preset wrapper over the bit-faithful scene pipeline: terrain recolor
gradients, the deterministic seed-{1,2,3,4} object placement, the ~240-entry
animation table, sunset sun curve, and per-frame subframe TLAS builds
(scene/loader.py; reference: scene.cc:135-718). The three stripped assets
(terrain/bunny/pine) fall back to procedural substitutes
(scene/assets.ensure_substitutes).
"""

from __future__ import annotations

from pathtracing_tpu.config import TESTING, RenderConfig
from pathtracing_tpu.models import _register


@_register("full_animation")
def build(
    config: RenderConfig = TESTING,
    frame: int = 0,
    data_dir: str | None = None,
    wide: bool | None = None,
):
    """Returns (Scene, SceneDevice) at animation frame ``frame``.

    wide=True attaches the mega-table fast path (accel/wide.py) via the
    incremental DevicePacker — static BLAS wide trees built once, only the
    frame's TLAS tail packed here; None auto-enables it on TPU. For a frame
    loop, keep the Scene and call scene.loader.setup_animation_frame +
    DevicePacker.pack_frame per frame (cli.py does this with host/device
    pipelining).
    """
    import jax

    from pathtracing_tpu.scene.device import DevicePacker
    from pathtracing_tpu.scene.loader import load_scene, setup_animation_frame

    if wide is None:
        wide = jax.default_backend() == "tpu"
    s = load_scene(data_dir=data_dir, config=config)
    setup_animation_frame(s, frame, config)
    dev = DevicePacker(
        s, wide=wide, chunk_max=1024 if wide else None
    ).pack_frame(s)
    return s, dev
