"""Test configuration: force CPU with an 8-device virtual mesh.

Must run before jax initializes. Note JAX_PLATFORMS env alone is not enough
on hosts where a TPU plugin self-registers; the config update below is the
reliable path.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import contextlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@contextlib.contextmanager
def x64_mode():
    """Temporarily enable f64 (CPU-only tests; jax.experimental.enable_x64
    is gone in this jax version)."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def reference_path(rel: str) -> str:
    p = os.path.join(REFERENCE, rel)
    if not os.path.exists(p):
        pytest.skip(f"reference asset not available: {rel}")
    return p
