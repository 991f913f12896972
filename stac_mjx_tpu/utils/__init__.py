"""Utility namespace.

Re-exports the helpers a reference (stac_mjx.utils) user expects to find in
one place; implementations live in the focused submodules.
"""

from stac_mjx_tpu.utils.batching import (
    CONTINUOUS_BATCH_OVERLAP,
    batch_kp_data,
    handle_edge_effects,
)
from stac_mjx_tpu.utils.velocity import compute_velocity_from_kinematics
from stac_mjx_tpu.utils.xla import enable_xla_flags, force_cpu, host_device_count

__all__ = [
    "CONTINUOUS_BATCH_OVERLAP",
    "batch_kp_data",
    "handle_edge_effects",
    "compute_velocity_from_kinematics",
    "enable_xla_flags",
    "force_cpu",
    "host_device_count",
]
