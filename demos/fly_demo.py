"""Fruit fly treadmill demo: CSV keypoints → STAC registration.

Equivalent of the reference's demos/run_stac_fly_model.py: drive the
``fly_treadmill`` workload (9 coarse keypoints: head/thorax/abdomen + one
claw per leg) from a treadmill CSV with ``<kp>_x/_y/_z`` columns.

The real dataset (datadryad.org doi:10.5061/dryad.mpg4f4r73) is not bundled;
offline, this script synthesizes a short tripod-gait walking bout in the same
CSV format and runs the full pipeline on it. Pass ``--csv path`` to use the
real recording.

    python demos/fly_demo.py [--frames 120] [--csv path]
"""

import argparse
import csv
from pathlib import Path

import numpy as np

import stac_mjx_tpu as stpu
from stac_mjx_tpu.config import compose_config

REPO = Path(__file__).resolve().parents[1]

KP_NAMES = ["head", "thorax", "abdomen", "r1", "r2", "r3", "l1", "l2", "l3"]


def synthesize_treadmill_csv(path: Path, n_frames: int) -> Path:
    """Write a tripod-gait walking bout in the treadmill CSV format (mm)."""
    t = np.linspace(0, 4 * np.pi, n_frames)
    body_z = 1.2 + 0.03 * np.sin(2 * t)
    # Body axis along +x: head front, abdomen back.
    base = {
        "head": (1.1, 0.0, 1.45),
        "thorax": (0.0, 0.0, 1.5),
        "abdomen": (-1.3, 0.0, 1.1),
        "r1": (0.8, -0.9, 0.0),
        "r2": (0.0, -1.1, 0.0),
        "r3": (-0.8, -1.0, 0.0),
        "l1": (0.8, 0.9, 0.0),
        "l2": (0.0, 1.1, 0.0),
        "l3": (-0.8, 1.0, 0.0),
    }
    # Tripod gait: {r1, l2, r3} swing in antiphase with {l1, r2, l3}.
    phase = {"r1": 0.0, "l2": 0.0, "r3": 0.0, "l1": np.pi, "r2": np.pi, "l3": np.pi}
    rows = []
    for i in range(n_frames):
        row = {}
        for kp in KP_NAMES:
            x, y, z = base[kp]
            if kp in phase:
                swing = np.sin(2 * t[i] + phase[kp])
                x = x + 0.25 * swing
                z = z + 0.15 * np.clip(np.cos(2 * t[i] + phase[kp]), 0, None)
            else:
                z = z + (body_z[i] - 1.2)
            row[f"{kp}_x"], row[f"{kp}_y"], row[f"{kp}_z"] = x, y, z
        rows.append(row)
    fieldnames = [f"{kp}{s}" for kp in KP_NAMES for s in ("_x", "_y", "_z")]
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--csv", type=str, default=None, help="real treadmill csv")
    args = ap.parse_args()

    csv_path = (
        Path(args.csv)
        if args.csv
        else synthesize_treadmill_csv(REPO / "fly_treadmill_demo.csv", args.frames)
    )

    cfg = compose_config(
        REPO / "configs",
        overrides=[
            "stac=stac_fly_treadmill",
            "model=fly_treadmill",
            f"stac.data_path={csv_path}",
            f"stac.n_fit_frames={args.frames}",
            f"stac.n_frames_per_clip={args.frames}",
            "stac.q_solver=gn",
            "stac.pose_mode=lockstep",
        ],
    )

    kp_data, kp_names = stpu.load_data(cfg, base_path=REPO)
    kp_data = kp_data[: args.frames]
    print(f"Loaded {kp_data.shape[0]} frames x {len(kp_names)} fly keypoints")

    fit_path, ik_path = stpu.run_stac(cfg, kp_data, kp_names, base_path=REPO)
    print(f"fit artifact: {fit_path}\nik artifact:  {ik_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
