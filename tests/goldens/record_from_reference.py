"""Record TRUE reference goldens from talmolab/stac-mjx (run elsewhere).

This environment cannot install the reference stack (no mujoco-mjx / jaxopt
wheels — VERDICT r1 item 1), so tests/goldens/*.npz are self-goldens of our
frozen parity mode. THIS script closes the loop on any machine where the
reference installs:

    pip install "stac-mjx @ git+https://github.com/talmolab/stac-mjx"  # or
    pip install mujoco mujoco-mjx "jaxopt==0.8.5" hydra-core h5py pynwb ndx-pose
    # + a checkout of talmolab/stac-mjx on PYTHONPATH

    python tests/goldens/record_from_reference.py /path/to/stac-mjx-checkout

It runs the REFERENCE package on the exact workloads in
tests/goldens/workloads.py (same configs, same frame budgets, same overrides)
and writes npz files with the identical schema — drop them into
tests/goldens/ and tests/test_parity.py then compares OUR parity mode against
the real reference instead of against itself. Array key schema (must match
workloads._fit_outputs): fit_qpos, fit_offsets, fit_markers, fit_kp
[, ik_qpos, ik_markers, ik_kp].

Reference API surface used (SURVEY.md §2.1): stac_mjx.load_configs /
compose_config (Hydra), stac_mjx.io.load_data, stac_mjx.stac.Stac(xml, cfg,
kp_names).fit_offsets / .ik_only — see /root/reference/stac_mjx/main.py:33-139.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent

# (name, config overrides, n_fit_frames, n_ik_frames or None)
# Budgets must stay in lockstep with tests/goldens/workloads.py.
WORKLOADS = [
    (
        "synth",
        ["stac=stac_synth_data", "model=synth_data"],
        None,  # n_fit from config (1)
        None,
    ),
    (
        "rodent_small",
        [
            "model=rodent",
            "stac=demo",
            "stac.n_fit_frames=3",
            "model.N_ITERS=2",
            "model.N_ITER_Q=100",
            "stac.n_frames_per_clip=5",
        ],
        3,
        10,
    ),
    (
        "rodent_demo_full",
        ["model=rodent", "stac=demo", "stac.n_frames_per_clip=10"],
        None,
        20,
    ),
]


def record(reference_root: Path, names=None) -> None:
    from stac_mjx import io as ref_io  # the REFERENCE package
    from stac_mjx.stac import Stac

    for name, overrides, n_fit, n_ik in WORKLOADS:
        if names and name not in names:
            continue
        # Compose with overrides (reference load_configs takes no override
        # arg; use its compose_config, else hydra compose directly).
        try:
            from stac_mjx.config import compose_config

            cfg = compose_config(
                str(reference_root / "configs"),
                config_name="config",
                overrides=overrides,
            )
        except TypeError:
            import hydra

            with hydra.initialize_config_dir(
                config_dir=str(reference_root / "configs"), version_base=None
            ):
                cfg = hydra.compose(config_name="config", overrides=overrides)

        kp_data, kp_names = ref_io.load_data(cfg, base_path=reference_root)
        kp_data = np.asarray(kp_data)
        xml = reference_root / cfg.model.MJCF_PATH
        stac = Stac(xml, cfg, kp_names)

        n_fit_frames = n_fit if n_fit is not None else int(cfg.stac.n_fit_frames)
        fit = stac.fit_offsets(kp_data[:n_fit_frames])
        out = {
            "fit_qpos": np.asarray(fit.qpos),
            "fit_offsets": np.asarray(fit.offsets),
            "fit_markers": np.asarray(fit.marker_sites),
            "fit_kp": np.asarray(fit.kp_data),
        }
        if n_ik:
            ik = stac.ik_only(kp_data[:n_ik], np.asarray(fit.offsets))
            out["ik_qpos"] = np.asarray(ik.qpos)
            out["ik_markers"] = np.asarray(ik.marker_sites)
            out["ik_kp"] = np.asarray(ik.kp_data)

        path = GOLDEN_DIR / f"{name}.npz"
        np.savez_compressed(path, **out)
        print(f"{name}: wrote {path} (REFERENCE-recorded golden)")
        for k, v in out.items():
            print(f"  {k}: shape={v.shape} mean|x|={float(np.abs(v).mean()):.6g}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    record(Path(sys.argv[1]), names=sys.argv[2:] or None)
