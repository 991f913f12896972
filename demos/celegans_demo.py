"""C. elegans demo: 2D tracked worm points → 3D prep → registration.

Equivalent of the reference's demos/stac_celegans.ipynb: take a 2D (pixel
space) 25-point worm midline recording, convert pixels → microns → model
units, recenter on the first frame's head, lift to 3D with z = 0, then run
the full STAC registration onto the C. elegans body model via the
``celegans_demo`` root config.

The notebook downloads a real recording (gdown); offline, this script
synthesizes an undulating midline (traveling sinusoid — the classic worm
crawling gait) in the same pixel-space format, so the whole prep + fit path
runs self-contained. Pass ``--npz path`` (array key ``all_frames``,
[frames, 25, 2] pixels) to use a real recording instead.

    python demos/celegans_demo.py [--frames 100] [--render]
"""

import argparse
from pathlib import Path

import numpy as np

import stac_mjx_tpu as stpu
from stac_mjx_tpu.config import compose_config

REPO = Path(__file__).resolve().parents[1]

N_POINTS = 25  # cl1..cl25 midline keypoints
MICRONS_PER_PIXEL = 1.44  # notebook's camera calibration


def synthesize_worm_2d(n_frames: int, body_len_px: float = 700.0) -> np.ndarray:
    """A crawling worm midline in pixel space: [frames, 25, 2].

    Traveling transverse sinusoid along the body with slow forward drift —
    shaped like the real recordings the notebook preps.
    """
    s = np.linspace(0.0, 1.0, N_POINTS)  # arclength, head→tail
    t = np.arange(n_frames) / n_frames
    x = s[None, :] * body_len_px + 40.0 * t[:, None] * body_len_px * 0.1
    amp = 60.0  # px
    y = amp * np.sin(2 * np.pi * (2.0 * s[None, :] - 3.0 * t[:, None]))
    return np.stack([x, y], axis=-1) + 1000.0


def prep_2d_to_3d(kp_2d_px: np.ndarray) -> np.ndarray:
    """The notebook's unit/recenter/lift pipeline: px → model units, z=0."""
    kp_microns = kp_2d_px * MICRONS_PER_PIXEL
    kp_units = kp_microns * 1e-3  # notebook's working scale
    kp_recentered = kp_units - kp_units[0, 0, :]
    z = np.zeros((*kp_recentered.shape[:2], 1))
    kp_3d = np.concatenate([kp_recentered, z], axis=-1)
    return kp_3d.reshape(kp_3d.shape[0], -1)  # (F, 25*3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--npz", type=str, default=None, help="real recording npz")
    ap.add_argument("--render", action="store_true")
    args = ap.parse_args()

    cfg = compose_config(
        REPO / "configs",
        config_name="celegans_demo",
        overrides=[
            f"stac.n_fit_frames={args.frames}",
            "stac.q_solver=gn",
            "stac.pose_mode=lockstep",
        ],
    )

    if args.npz:
        kp_2d = np.load(args.npz)["all_frames"][: args.frames]
    else:
        kp_2d = synthesize_worm_2d(args.frames)
    kp_data = prep_2d_to_3d(kp_2d)
    kp_names = [f"cl{i}" for i in range(1, N_POINTS + 1)]
    print(f"Prepped {kp_data.shape[0]} frames of {N_POINTS}-point worm midline")

    fit_path, ik_path = stpu.run_stac(cfg, kp_data, kp_names, base_path=REPO)
    print(f"fit artifact: {fit_path}\nik artifact:  {ik_path}")

    if args.render:
        out = REPO / "celegans_demo.mp4"
        stpu.viz_stac(
            fit_path,
            min(args.frames, 50),
            out,
            camera="track",
            base_path=REPO,
            show_marker_error=True,
        )
        print(f"video: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
