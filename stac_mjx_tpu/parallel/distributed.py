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

import logging

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stac_mjx_tpu.parallel.mesh import CLIP_AXIS, clip_mesh, init_distributed

__all__ = [
    "init_distributed",
    "pod_mesh",
    "local_clip_range",
    "make_global_clips",
    "make_global_frames",
    "fetch_arrays",
    "psum_error_stats",
    "run_stac_distributed",
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


def make_global_frames(local_frames: np.ndarray, mesh: Mesh | None = None):
    """Assemble a frame-sharded global array from this host's frame block.

    Same contract as make_global_clips but for a flat (n_frames, K*3)
    recording slice — used by the sharded fit, where the shard axis is
    frames rather than clips.
    """
    return make_global_clips(local_frames, mesh)


def fetch_arrays(tree):
    """Bring a pytree of jax Arrays to host numpy, pod-global safe.

    Fully-addressable arrays ride one batched jax.device_get (single D2H
    round trip — the tunnel-latency optimization); pod-global shards are
    allgathered across processes first so every host returns the full
    array.
    """
    import jax.numpy as jnp  # noqa: F401 (keep jax initialized lazily)

    leaves = jax.tree_util.tree_leaves(tree)
    if all(
        not isinstance(x, jax.Array) or x.is_fully_addressable for x in leaves
    ):
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def _local_frame_count(n_total: int, n_dev: int, what: str) -> int:
    usable = (n_total // n_dev) * n_dev
    if usable == 0:
        raise ValueError(
            f"{n_total} {what} cannot shard over {n_dev} devices — need at "
            f"least one per device"
        )
    if usable < n_total:
        logging.getLogger(__name__).warning(
            "truncating %s from %d to %d to divide over %d devices",
            what,
            n_total,
            usable,
            n_dev,
        )
    return usable


def run_stac_distributed(cfg, base_path=None):
    """Multi-host pipeline: the pod-scale twin of main.run_stac.

    Launch one process per TPU host (cli --distributed calls
    init_distributed first). Wiring (VERDICT r1 item 2):

    - every host composes the same config, loads the recording, and builds
      the same model;
    - fit: the first n_fit_frames shard over ALL chips in the pod
      (frame-axis shard_map; psum'd m-phase; pose_mode forced lockstep);
    - ik: clips shard per local_clip_range — each host contributes only its
      contiguous clip block to the global array (make_global_clips);
    - results are allgathered so every host holds full outputs; process 0
      writes the h5 artifacts (same schema as the single-host path).

    The per-host *file read* is currently the whole recording (the slice
    happens in host RAM); format-level partial reads are a follow-up
    optimization, not a correctness requirement — device memory only ever
    holds the local shard.
    """
    from pathlib import Path

    from stac_mjx_tpu import io
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    base_path = Path(base_path) if base_path is not None else Path.cwd()
    mesh = pod_mesh()
    n_dev = int(mesh.devices.size)
    proc0 = jax.process_index() == 0
    log = logging.getLogger(__name__)

    kp_data, kp_names = io.load_data(cfg, base_path=base_path)
    kp_data = np.asarray(kp_data)
    xml = base_path / cfg.model.MJCF_PATH
    if not xml.exists():
        xml = resolve_asset(cfg.model.MJCF_PATH, base_path)
    stac = Stac(xml, cfg, kp_names)

    fit_path = base_path / cfg.stac.fit_offsets_path
    ik_path = base_path / cfg.stac.ik_only_path

    offsets = None
    if cfg.stac.skip_fit_offsets:
        log.info("fit skipped; reading offsets from %s", fit_path)
        _, fit_data = io.load_stac_data(fit_path)
        offsets = fit_data.offsets
    else:
        n_fit = _local_frame_count(
            min(int(cfg.stac.n_fit_frames), kp_data.shape[0]), n_dev,
            "fit frames",
        )
        per_host = n_fit // jax.process_count()
        lo = jax.process_index() * per_host
        local = kp_data[lo : lo + per_host].astype(np.float32)
        kp_global = make_global_frames(local, mesh)
        fit_data = stac.fit_offsets_sharded(kp_global, mesh)
        offsets = fit_data.offsets
        if proc0:
            io.save_data_to_h5(config=cfg, file_path=fit_path, **fit_data.as_dict())
            log.info("fit artifact written: %s", fit_path)

    if cfg.stac.skip_ik_only:
        return fit_path, None

    from stac_mjx_tpu.utils.batching import batch_kp_data, handle_edge_effects

    clip_len = int(cfg.stac.n_frames_per_clip)
    if kp_data.shape[0] % clip_len != 0:
        raise ValueError(
            f"cannot split {kp_data.shape[0]} frames into clips of {clip_len}"
        )
    batched = batch_kp_data(
        kp_data, clip_len, continuous=bool(cfg.stac.continuous)
    ).astype(np.float32)
    n_clips = batched.shape[0]
    lo, hi = local_clip_range(n_clips, mesh)
    kp_global = make_global_clips(np.asarray(batched[lo:hi]), mesh)
    ik_data = stac.ik_only_global(kp_global, offsets)

    if cfg.stac.continuous:
        ik_data = handle_edge_effects(ik_data, clip_len)

    if cfg.stac.infer_qvels:
        from stac_mjx_tpu.utils.velocity import compute_velocity_from_kinematics

        per_clip_qpos = ik_data.qpos.reshape((-1, clip_len, ik_data.qpos.shape[-1]))
        qvels = jax.vmap(
            lambda qs: compute_velocity_from_kinematics(
                qs,
                dt=float(stac._mj_model.opt.timestep),
                freejoint=stac._freejoint,
            )
        )(per_clip_qpos)
        ik_data.qvel = np.asarray(qvels).reshape(-1, *np.shape(qvels)[2:])

    if proc0:
        io.save_data_to_h5(config=cfg, file_path=ik_path, **ik_data.as_dict())
        log.info("ik artifact written: %s", ik_path)
    return fit_path, ik_path


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
