"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). Must run before jax imports.
"""

import os

# Tests always run on CPU (the ambient env may preset a TPU platform).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep f32 exactly f32 on CPU (no TF32-style shenanigans in tests).
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The ambient environment pins jax_platforms to the axon TPU plugin; the env
# var alone does not override it, the config call does.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
ASSET_DIR = pathlib.Path(__file__).parent.parent / "assets"
REFERENCE_DATA = pathlib.Path(
    os.environ.get("REFERENCE_DIR", "/root/reference")
) / "data"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables at module boundaries.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; past ~70 tests the next big compile segfaults inside
    backend_compile (LLVM JIT state pathology — reproduced twice at the
    same test, passes in isolation). Modules are self-contained
    compilation-wise, so clearing between them costs little and keeps the
    one-process suite stable.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


def require_golden(name: str) -> pathlib.Path:
    path = GOLDEN_DIR / name
    if not path.exists():
        pytest.skip(f"golden file {name} not generated (run tools/make_goldens.py)")
    return path


def require_reference_data(name: str) -> pathlib.Path:
    path = REFERENCE_DATA / name
    if not path.exists():
        pytest.skip(f"reference asset {name} unavailable")
    return path
