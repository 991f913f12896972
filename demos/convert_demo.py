"""Data conversion + inspection demo: .mat → NWB, then view it.

Equivalent of the reference's demos/Mat-to-Nwb.ipynb (conversion via
pynwb/ndx-pose) and demos/view_nwb.ipynb (file inspection), using the
first-party h5py-based writer/reader in ``stac_mjx_tpu.utils.convert``.

    python demos/convert_demo.py [--mat path] [--names path] [--out out.nwb]

With no arguments it converts the reference's rodent demo recording
(1000 frames × 23 keypoints, names from the rat23 label3d file).
"""

import argparse
from pathlib import Path

from stac_mjx_tpu.utils import convert
from stac_mjx_tpu.utils.assets import resolve_asset

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", default="tests/data/test_rodent_mocap_1000_frames.mat")
    ap.add_argument("--names", default="tests/data/rat23.mat")
    ap.add_argument("--out", default=str(REPO / "converted.nwb"))
    ap.add_argument("--fps", type=float, default=50.0)
    args = ap.parse_args()

    mat = resolve_asset(args.mat, REPO)
    names = resolve_asset(args.names, REPO) if args.names else None
    if not mat.exists():
        print(f"input not found: {args.mat}")
        return 1

    out = convert.mat_to_nwb(mat, args.out, names_path=names, fps=args.fps)
    print(f"wrote {out}")
    convert.describe_nwb(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
