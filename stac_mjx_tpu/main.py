"""User-level pipeline driver: load configs, run fit + IK, save artifacts.

Parity surface of the reference's `stac_mjx/main.py`: the same validation
(kp columns vs names, clip divisibility), the same phase-granular
checkpointing (fit output h5 is the checkpoint; offsets are re-loaded from it
before ik_only, main.py:111-113), the same skip flags, crossfade for
continuous clips, and vmapped qvel inference.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import jax
import numpy as np

from stac_mjx_tpu import io
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils import xla
from stac_mjx_tpu.utils.batching import handle_edge_effects
from stac_mjx_tpu.utils.velocity import compute_velocity_from_kinematics


def load_configs(config_dir: Path | str, config_name: str = "config"):
    """Load and validate configs from a config directory."""
    cfg = compose_config(config_dir, config_name=config_name)
    print("Config loaded and validated.")
    return cfg


def run_stac(cfg, kp_data, kp_names, base_path: Path | None = None):
    """Run the full registration pipeline (fit_offsets then ik_only).

    Returns (fit_offsets output path, ik_only output path or None), matching
    the reference run_stac (stac_mjx/main.py:33-139).
    """
    if base_path is None:
        base_path = Path.cwd()
    base_path = Path(base_path)

    expected_cols = len(kp_names) * 3
    if kp_data.shape[1] != expected_cols:
        raise ValueError(
            f"kp_data has {kp_data.shape[1]} columns but expected "
            f"{expected_cols} ({len(kp_names)} keypoints x 3). Ensure kp_data "
            f"is shaped (n_frames, n_keypoints * 3) and that kp_names length "
            f"matches the number of keypoints in kp_data."
        )

    xla.enable_xla_flags()
    start_time = time.time()

    fit_offsets_path = base_path / cfg.stac.fit_offsets_path
    ik_only_path = base_path / cfg.stac.ik_only_path
    xml_path = base_path / cfg.model.MJCF_PATH
    if not xml_path.exists():
        from stac_mjx_tpu.utils.assets import resolve_asset

        xml_path = resolve_asset(cfg.model.MJCF_PATH, base_path)

    stac = Stac(xml_path, cfg, kp_names)

    compute_velocity_fn = partial(
        compute_velocity_from_kinematics,
        dt=float(stac._mj_model.opt.timestep),
        freejoint=stac._freejoint,
    )
    vmap_compute_velocity_fn = jax.vmap(compute_velocity_fn)

    if not cfg.stac.skip_fit_offsets:
        kps = kp_data[: int(cfg.stac.n_fit_frames)]
        print(f"Running fit. Mocap data shape: {kps.shape}")
        fit_offsets_data = stac.fit_offsets(kps)
        print(f"saving data to {fit_offsets_path}", flush=True)
        io.save_data_to_h5(
            config=cfg, file_path=fit_offsets_path, **fit_offsets_data.as_dict()
        )
    else:
        print(
            "Skipping fit_offsets. To change this behavior, set "
            "cfg.stac.skip_fit_offsets to False."
        )

    if cfg.stac.skip_ik_only:
        print(
            "Skipping IK-only phase. To change this behavior, set "
            "cfg.stac.skip_ik_only to False."
        )
        return fit_offsets_path, None
    elif kp_data.shape[0] % int(cfg.stac.n_frames_per_clip) != 0:
        raise ValueError(
            f"n_frames_per_clip ({cfg.stac.n_frames_per_clip}) must divide "
            f"evenly with the total number of mocap frames({kp_data.shape[0]})"
        )

    print("Running ik_only()")
    # Phase-granular resume: offsets always come from the fit artifact.
    cfg, fit_offsets_data = io.load_stac_data(fit_offsets_path)
    offsets = fit_offsets_data.offsets

    print(f"kp_data shape: {kp_data.shape}")
    ik_only_data = stac.ik_only(kp_data, offsets)

    if cfg.stac.continuous:
        print("Handling edge effects...")
        ik_only_data = handle_edge_effects(
            ik_only_data, int(cfg.stac.n_frames_per_clip)
        )

    batched_qpos = ik_only_data.qpos.reshape(
        (-1, int(cfg.stac.n_frames_per_clip), ik_only_data.qpos.shape[-1])
    )
    print(f"Final qpos shape: {ik_only_data.qpos.shape}")
    if cfg.stac.infer_qvels:
        t_vel = time.time()
        qvels = vmap_compute_velocity_fn(batched_qpos)
        ik_only_data.qvel = np.array(qvels).reshape(-1, *np.shape(qvels)[2:])
        print(f"Finished compute velocity in {time.time() - t_vel} seconds")

    print(
        f"Saving data to {ik_only_path}. Finished in "
        f"{(time.time() - start_time) / 60:.2f} minutes"
    )
    io.save_data_to_h5(config=cfg, file_path=ik_only_path, **ik_only_data.as_dict())
    return fit_offsets_path, ik_only_path
