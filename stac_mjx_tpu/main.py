"""Top-level pipeline driver: calibration fit, full-recording IK, artifacts.

Behavior-compatible with the reference driver (stac_mjx/main.py:33-139) —
same validation rules, same skip flags, same h5 artifacts, and the same
phase-granular resume contract (the fit h5 is the checkpoint; IK always
reads its offsets back from that file) — implemented as two small phase
functions composed by ``run_stac``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import numpy as np

from stac_mjx_tpu import io
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils import xla
from stac_mjx_tpu.utils.batching import handle_edge_effects
from stac_mjx_tpu.utils.velocity import compute_velocity_from_kinematics

log = logging.getLogger(__name__)


def load_configs(config_dir: Path | str, config_name: str = "config"):
    """Compose and schema-validate the config tree rooted at ``config_dir``."""
    cfg = compose_config(config_dir, config_name=config_name)
    log.info("Composed config '%s' from %s", config_name, config_dir)
    return cfg


def _require_kp_columns(kp_data, kp_names) -> None:
    """kp_data must be (n_frames, 3 * len(kp_names)); raise otherwise.

    Same precondition the reference enforces (stac_mjx/main.py:60-67).
    """
    want = 3 * len(kp_names)
    got = kp_data.shape[1]
    if got != want:
        raise ValueError(
            f"keypoint array is (n_frames, {got}) but {len(kp_names)} names "
            f"imply {want} columns; reshape to (n_frames, n_keypoints*3) or "
            f"fix the keypoint-name list"
        )


def _resolve_model_xml(cfg, base_path: Path) -> Path:
    xml = base_path / cfg.model.MJCF_PATH
    if xml.exists():
        return xml
    from stac_mjx_tpu.utils.assets import resolve_asset

    return resolve_asset(cfg.model.MJCF_PATH, base_path)


def fit_phase(stac: Stac, cfg, kp_data, out_path: Path) -> Path:
    """Run the alternating calibration on the first n_fit_frames and save it."""
    fit_slice = kp_data[: int(cfg.stac.n_fit_frames)]
    log.info("fit_offsets on %s frames", fit_slice.shape[0])
    result = stac.fit_offsets(fit_slice)
    io.save_data_to_h5(config=cfg, file_path=out_path, **result.as_dict())
    log.info("fit artifact written: %s", out_path)
    return out_path


def ik_phase(stac: Stac, cfg, kp_data, fit_path: Path, out_path: Path) -> Path:
    """Full-recording IK with offsets restored from the fit artifact."""
    clip_len = int(cfg.stac.n_frames_per_clip)
    n_frames = kp_data.shape[0]
    if n_frames % clip_len != 0:
        raise ValueError(
            f"cannot split {n_frames} frames into clips of {clip_len}: "
            f"choose stac.n_frames_per_clip to divide the recording length"
        )

    # Resume contract: offsets come from the fit h5, never from memory —
    # a run with skip_fit_offsets=true picks up a previous fit's artifact.
    cfg, fit_data = io.load_stac_data(fit_path)
    result = stac.ik_only(kp_data, fit_data.offsets)

    if cfg.stac.continuous:
        log.info("crossfading clip overlaps (continuous recording)")
        result = handle_edge_effects(result, clip_len)

    if cfg.stac.infer_qvels:
        t0 = time.time()
        per_clip_qpos = result.qpos.reshape((-1, clip_len, result.qpos.shape[-1]))
        qvels = jax.vmap(
            lambda qs: compute_velocity_from_kinematics(
                qs,
                dt=float(stac._mj_model.opt.timestep),
                freejoint=stac._freejoint,
            )
        )(per_clip_qpos)
        result.qvel = np.asarray(qvels).reshape(-1, *np.shape(qvels)[2:])
        log.info("qvel inference took %.2fs", time.time() - t0)

    io.save_data_to_h5(config=cfg, file_path=out_path, **result.as_dict())
    log.info("ik artifact written: %s", out_path)
    return out_path


def run_stac(cfg, kp_data, kp_names, base_path: Path | None = None):
    """Run fit_offsets then ik_only per the config's skip flags.

    Returns ``(fit_h5_path, ik_h5_path or None)`` — the reference driver's
    contract (stac_mjx/main.py:33-139).
    """
    base_path = Path(base_path) if base_path is not None else Path.cwd()
    _require_kp_columns(kp_data, kp_names)

    xla.enable_xla_flags()
    t_start = time.time()

    fit_path = base_path / cfg.stac.fit_offsets_path
    ik_path = base_path / cfg.stac.ik_only_path
    stac = Stac(_resolve_model_xml(cfg, base_path), cfg, kp_names)

    if cfg.stac.skip_fit_offsets:
        log.info(
            "fit_offsets skipped (stac.skip_fit_offsets=true); "
            "expecting an existing fit artifact at %s",
            fit_path,
        )
    else:
        fit_phase(stac, cfg, kp_data, fit_path)

    if cfg.stac.skip_ik_only:
        log.info("ik_only skipped (stac.skip_ik_only=true)")
        log.info("pipeline finished in %.2f min", (time.time() - t_start) / 60)
        return fit_path, None

    ik_phase(stac, cfg, kp_data, fit_path, ik_path)
    log.info("pipeline finished in %.2f min", (time.time() - t_start) / 60)
    return fit_path, ik_path
