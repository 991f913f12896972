"""Rodent demo: the canonical API walkthrough, as a runnable script.

Equivalent of the reference's demos/rodent_demo.ipynb: load the demo mocap
recording, fit marker offsets on a frame subset, run batched IK over the full
recording, and render a clip.

Run from the repo root:

    python demos/rodent_demo.py [--frames 250] [--render]

Solver/scheduling knobs worth trying (config overrides):
    stac.q_solver=gn        analytic Gauss-Newton (fast, default here)
    stac.pose_mode=lockstep all frames in parallel (default here)
    stac.q_solver=pg stac.pose_mode=sequential   reference-parity numerics
"""

import argparse
from pathlib import Path

import numpy as np

import stac_mjx_tpu as stpu
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.utils.assets import resolve_asset

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=250, help="frames to fit/ik")
    ap.add_argument("--render", action="store_true", help="render an mp4 clip")
    ap.add_argument("--solver", default="gn", choices=["gn", "pg"])
    ap.add_argument("--mode", default="lockstep", choices=["lockstep", "sequential"])
    args = ap.parse_args()

    cfg = compose_config(
        REPO / "configs",
        overrides=[
            "stac=demo",
            "model=rodent",
            f"stac.n_fit_frames={args.frames}",
            f"stac.n_frames_per_clip={args.frames}",
            f"stac.q_solver={args.solver}",
            f"stac.pose_mode={args.mode}",
            "stac.skip_ik_only=false",
        ],
    )
    data = resolve_asset("tests/data/test_rodent_mocap_1000_frames.nwb", REPO)
    cfg.stac.data_path = str(data)

    kp_data, kp_names = stpu.load_data(cfg, base_path=REPO)
    kp_data = kp_data[: args.frames]
    print(f"Loaded {kp_data.shape[0]} frames x {len(kp_names)} keypoints")

    fit_path, ik_path = stpu.run_stac(cfg, kp_data, kp_names, base_path=REPO)
    print(f"fit artifact: {fit_path}\nik artifact:  {ik_path}")

    if args.render:
        out = REPO / "rodent_demo.mp4"
        stpu.viz_stac(
            ik_path or fit_path,
            n_frames=min(100, args.frames),
            save_path=out,
            base_path=REPO,
            show_marker_error=True,
        )
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
