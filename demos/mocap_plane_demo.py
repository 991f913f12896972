"""Floor-plane estimation demo: level a mocap recording before fitting.

Equivalent of the reference's demos/estimate_mocap_plane.ipynb: estimate the
ground plane from foot/paw keypoints near their lowest excursion, then rotate
the whole recording so the plane is z-up at z=0.

    python demos/mocap_plane_demo.py
"""

from pathlib import Path

import numpy as np

import stac_mjx_tpu as stpu
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.utils.assets import resolve_asset

REPO = Path(__file__).resolve().parents[1]

FOOT_KPS = ["FootL", "FootR", "HandL", "HandR"]


def estimate_plane(points: np.ndarray):
    """Least-squares plane through points: returns (normal, offset)."""
    centroid = points.mean(axis=0)
    _, _, vt = np.linalg.svd(points - centroid)
    normal = vt[-1]
    if normal[2] < 0:
        normal = -normal
    return normal, float(normal @ centroid)


def level_recording(kp_data: np.ndarray, kp_names, foot_names=FOOT_KPS):
    """Rotate/translate a (F, K*3) recording so the floor is z=0, z-up."""
    kps = kp_data.reshape(kp_data.shape[0], -1, 3)
    idx = [kp_names.index(n) for n in foot_names if n in kp_names]
    feet = kps[:, idx].reshape(-1, 3)
    # Plane from the lowest 20% of foot samples (stance, not swing).
    z_thresh = np.quantile(feet[:, 2], 0.2)
    normal, d = estimate_plane(feet[feet[:, 2] <= z_thresh])

    # Rotation taking the plane normal to +z (Rodrigues).
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(normal, z)
    s, c = np.linalg.norm(v), float(normal @ z)
    if s < 1e-12:
        rot = np.eye(3)
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        rot = np.eye(3) + vx + vx @ vx * ((1 - c) / s**2)

    leveled = kps @ rot.T
    leveled[..., 2] -= np.quantile(leveled[:, idx, 2].reshape(-1), 0.2)
    return leveled.reshape(kp_data.shape), rot


def main() -> int:
    cfg = compose_config(REPO / "configs", overrides=["stac=demo", "model=rodent"])
    data = resolve_asset("tests/data/test_rodent_mocap_1000_frames.nwb", REPO)
    cfg.stac.data_path = str(data)
    kp_data, kp_names = stpu.load_data(cfg, base_path=REPO)
    kp_data = np.asarray(kp_data)

    leveled, rot = level_recording(kp_data, list(kp_names))
    tilt_deg = np.degrees(np.arccos(np.clip(rot[2, 2], -1, 1)))
    print(f"estimated floor tilt: {tilt_deg:.3f} deg; applied rotation:\n{rot}")
    idx = [list(kp_names).index(n) for n in FOOT_KPS if n in kp_names]
    feet_z = leveled.reshape(len(leveled), -1, 3)[:, idx, 2]
    print(f"foot-keypoint z after leveling: p20={np.quantile(feet_z, .2):.5f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
