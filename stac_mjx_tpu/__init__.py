"""stac_mjx_tpu: TPU-native STAC skeletal registration.

Public API surface mirrors the reference package
(stac_mjx/__init__.py:3-6): enable_xla_flags, load_data, load_configs,
run_stac, viz_stac.
"""

import os as _os

# Headless rendering default: mujoco picks its GL backend at import time, so
# this must be decided before any module here imports mujoco. The reference
# leaves this as a manual install step (its README.md:79-96).
if "MUJOCO_GL" not in _os.environ and not _os.environ.get("DISPLAY"):
    _os.environ["MUJOCO_GL"] = "egl"

from stac_mjx_tpu.io import load_data
from stac_mjx_tpu.main import load_configs, run_stac
from stac_mjx_tpu.utils.xla import enable_xla_flags
from stac_mjx_tpu.version import __version__


def viz_stac(*args, **kwargs):
    """Render FK from a STAC output file (lazy import: needs OpenGL)."""
    from stac_mjx_tpu.viz import viz_stac as _viz

    return _viz(*args, **kwargs)


__all__ = [
    "enable_xla_flags",
    "load_data",
    "load_configs",
    "run_stac",
    "viz_stac",
    "__version__",
]
