"""Runtime/XLA configuration for TPU execution.

TPU-oriented counterpart of the reference's `enable_xla_flags`
(stac_mjx/utils.py:21-31): persistent compilation cache (first TPU compiles
are expensive; cached reruns are not) and platform helpers. The GPU
triton-gemm flag has no TPU analog and is dropped.
"""

from __future__ import annotations

import os


def enable_xla_flags(cache_dir: str | None = None) -> None:
    """Enable the persistent JAX compilation cache (TPU-friendly defaults).

    Skipped on remote-compile proxy backends (JAX_PLATFORMS containing
    "axon"): persistent-cache serialization deadlocks the remote-compile
    tunnel there (verified: with the cache on, even a trivial op never
    returns its result to the host).
    """
    import jax

    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "stac-mjx-tpu", "jax"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def force_cpu() -> None:
    """Force the CPU backend (tests / goldens).

    Note: on hosts where a TPU plugin registers itself at interpreter start,
    the JAX_PLATFORMS env var can be overridden — this config update is the
    reliable path and must run before first device use.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")


def host_device_count(n: int = 8) -> None:
    """Split the host CPU into n virtual devices (multi-chip dry runs).

    Must be called before jax initializes; pairs with force_cpu().
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
