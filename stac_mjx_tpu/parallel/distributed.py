"""Multi-host distribution: per-host data loading and sharded pipelines.

The reference is strictly single-process/single-device (SURVEY.md §2.3).
This module is the multi-host entry layer for the TPU build:

- one process per TPU host calls ``init_distributed()``
  (jax.distributed.initialize) and then builds the 1-D clip mesh over ALL
  chips in the pod;
- each host loads only ITS slice of the recording
  (``local_clip_range``) and assembles the global sharded array with
  ``make_global_clips`` (jax.make_array_from_process_local_data) — no host
  ever materializes the full recording;
- the q-phase runs embarrassingly parallel over the clip axis (zero
  collectives, ICI/DCN untouched); only the m-phase and error statistics
  reduce globally (psum — see ops/solver.m_opt_closed_form's axis_name).

Single-process fall-through: every helper degrades to the plain local path
so the same driver script runs unchanged on one chip, a CPU mesh, or a pod.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stac_mjx_tpu.parallel.mesh import CLIP_AXIS, clip_mesh, init_distributed

__all__ = [
    "init_distributed",
    "pod_mesh",
    "local_clip_range",
    "make_global_clips",
    "psum_error_stats",
]


def pod_mesh() -> Mesh:
    """The 1-D clip mesh over every addressable chip in the pod (all hosts)."""
    return clip_mesh(devices=jax.devices())


def local_clip_range(n_clips: int, mesh: Mesh | None = None) -> tuple[int, int]:
    """[start, stop) of the clip indices THIS host's shard covers.

    Clips are laid out contiguously over the mesh's device order, so a host
    owns a contiguous block; use this to slice the recording before loading
    frames from disk (each host reads only its block).
    """
    if mesh is None:
        mesh = pod_mesh()
    n_dev = mesh.devices.size
    per_dev = n_clips // n_dev
    if per_dev * n_dev != n_clips:
        raise ValueError(
            f"{n_clips} clips do not divide over {n_dev} devices; pad the "
            f"recording or choose n_frames_per_clip so clips % devices == 0"
        )
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    if not local:
        return 0, 0
    order = {id(d): i for i, d in enumerate(mesh.devices.flat)}
    idxs = sorted(order[id(d)] for d in local)
    if idxs != list(range(idxs[0], idxs[-1] + 1)):
        raise ValueError(
            "this host's devices are not contiguous in the mesh order; "
            "build the mesh with per-process device blocks (e.g. "
            "Mesh(np.array(jax.devices())) with default process-major "
            "ordering) before using contiguous clip loading"
        )
    return idxs[0] * per_dev, (idxs[-1] + 1) * per_dev


def make_global_clips(local_clips: np.ndarray, mesh: Mesh | None = None):
    """Assemble the pod-global clip-sharded array from this host's block.

    local_clips: (local_n_clips, frames, K*3) — the slice from
    ``local_clip_range``. Returns a global jax.Array sharded P(CLIP_AXIS).
    In a single-process run this is just a device_put with the local mesh.
    """
    if mesh is None:
        mesh = pod_mesh()
    sharding = NamedSharding(mesh, P(CLIP_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_clips, sharding)
    return jax.make_array_from_process_local_data(sharding, local_clips)


def psum_error_stats(errors, axis_name: str = CLIP_AXIS):
    """Global mean/std of per-frame errors from shard-local values.

    For use inside shard_map'd programs: reduces count/sum/sumsq with psum
    so every host reports identical statistics (deterministic: the reduction
    is over per-shard partial sums in mesh order).
    """
    import jax.numpy as jnp

    n = jax.lax.psum(jnp.asarray(errors.size, errors.dtype), axis_name)
    s = jax.lax.psum(jnp.sum(errors), axis_name)
    ss = jax.lax.psum(jnp.sum(errors * errors), axis_name)
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    return mean, jnp.sqrt(var)
