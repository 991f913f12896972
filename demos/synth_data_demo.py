"""Synthetic-data demo: generate a recording by FK and fit it back.

Equivalent of the reference's demos/create_synth_data.ipynb: drive the
single-keypoint pendulum model through a known trajectory, synthesize
keypoints by forward kinematics with a known marker offset, then run the
pipeline and check it recovers the motion.

    python demos/synth_data_demo.py
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import stac_mjx_tpu as stpu
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils.assets import resolve_asset

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    n_frames = 50
    cfg = compose_config(
        REPO / "configs",
        overrides=[
            "stac=synth",
            "model=synth_data",
            f"stac.n_fit_frames={n_frames}",
            f"stac.n_frames_per_clip={n_frames}",
            "stac.q_solver=gn",
            "stac.pose_mode=lockstep",
        ],
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, REPO)
    stac = Stac(xml, cfg, list(cfg.model.KP_NAMES))

    # A known trajectory: the free body slides along x and bobs in z.
    t = np.linspace(0, 2 * np.pi, n_frames)
    qs = np.tile(np.asarray(stac.params.qpos0), (n_frames, 1))
    qs[:, 0] = 0.2 * np.sin(t)
    qs[:, 2] = 0.3 + 0.05 * np.cos(t)

    # Synthesize keypoints by FK with the configured initial marker offset.
    fk = jax.vmap(stac.stac_core_obj.fk, in_axes=(None, 0))
    kp = np.asarray(
        fk(stac.params, jnp.asarray(qs, jnp.float32)).site_xpos[
            :, stac._body_site_idxs
        ]
    ).reshape(n_frames, -1)

    fit = stac.fit_offsets(jnp.asarray(kp, jnp.float32))
    err = np.linalg.norm(
        fit.marker_sites.reshape(n_frames, -1, 3)
        - kp.reshape(n_frames, -1, 3),
        axis=-1,
    ).mean()
    print(f"mean marker residual after fit: {err * 1000:.4f} mm")
    drift = np.abs(fit.qpos[:, :3] - qs[:, :3]).max()
    print(f"max recovered-translation error: {drift * 1000:.4f} mm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
