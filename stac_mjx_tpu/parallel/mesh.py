"""Device-mesh utilities: the clip-axis data distribution layer.

The reference has no distributed layer at all (grep-verified; SURVEY.md
§2.3). Here clips are the shard axis: `ik_only`'s clip solves are
embarrassingly parallel, so sharding the leading clip axis of the batched
keypoints over a 1-D mesh lets XLA partition the whole vmapped program with
zero collectives; the m-phase reduces its frame statistics with psum
(stac_mjx_tpu/ops/solver.py:m_opt_closed_form) when frames are sharded.

Multi-host entry: `init_distributed()` wraps jax.distributed.initialize.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CLIP_AXIS = "clips"


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (one process per TPU host). No-op if single."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Already initialized or single-process environment.
        pass


def clip_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the clip axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CLIP_AXIS,))


def shard_clips(batched, mesh: Mesh | None = None):
    """Shard an array's leading clip axis across the mesh.

    Falls back to replication when there is one device or the clip count
    does not divide the device count (uneven clip counts are legal inputs).
    """
    if mesh is None:
        devices = jax.devices()
        if len(devices) <= 1:
            return batched
        n = batched.shape[0]
        n_use = min(len(devices), n)
        while n_use > 1 and n % n_use != 0:
            n_use -= 1
        if n_use < min(len(devices), n):
            logging.getLogger(__name__).warning(
                "shard_clips: %d clips do not divide over %d devices; "
                "degrading to %d device(s). Pad the recording or pick "
                "n_frames_per_clip so the clip count is divisible.",
                n,
                len(devices),
                max(n_use, 1),
            )
        if n_use <= 1:
            return batched
        mesh = clip_mesh(n_use)
    sharding = NamedSharding(mesh, P(CLIP_AXIS))
    return jax.device_put(batched, sharding)
