"""Real-data workloads the reference pins (VERDICT r1 item 6).

- the real 3600-frame mouse .h5 through load_data (exercises load_h5's
  squeeze/transpose path on actual data, matching the reference's
  tests/test_io.py:92-95) and a short mouse ik_only;
- a fixed-root (tethered fly) fit_offsets + ik_only end-to-end, exercising
  the do_root_opt=False control flow the reference hits via its fly demo
  driver (demos/run_stac_fly_model.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stac_mjx_tpu import io
from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils.assets import resolve_asset

from conftest import reference_path


@pytest.fixture(scope="module")
def mouse_cfg():
    return compose_config(
        "/root/repo/configs",
        overrides=[
            "model=mouse",
            "stac=stac_mouse",
            "stac.q_solver=gn-lm",
            "stac.pose_mode=lockstep",
            "stac.skip_part_opt=true",
            "stac.n_frames_per_clip=4",
        ],
    )


def test_mouse_h5_loads_real_recording(mouse_cfg):
    """3600x34x3 mouse .h5 -> (3600, 102), like the reference's io test."""
    path = reference_path("tests/data/test_mouse_mocap_3600_frames.h5")
    mouse_cfg.stac.data_path = path
    kp_data, names = io.load_data(mouse_cfg, base_path="/root/repo")
    assert np.shape(kp_data) == (3600, 102)
    assert len(names) == 34
    assert np.isfinite(np.asarray(kp_data)).all()


def test_mouse_short_ik_on_real_data(mouse_cfg):
    """Mouse model + real recording through a short ik_only."""
    path = reference_path("tests/data/test_mouse_mocap_3600_frames.h5")
    mouse_cfg.stac.data_path = path
    kp_data, names = io.load_data(mouse_cfg, base_path="/root/repo")
    xml = resolve_asset(mouse_cfg.model.MJCF_PATH, "/root/repo")
    if not xml.exists():
        pytest.skip("mouse model asset unavailable")
    stac = Stac(xml, mouse_cfg, names)
    kp8 = np.asarray(kp_data[:8])
    out = stac.ik_only(kp8, stac._offsets)
    assert out.qpos.shape == (8, stac.topo.nq)
    assert np.isfinite(out.qpos).all()
    assert np.isfinite(out.marker_sites).all()


@pytest.fixture(scope="module")
def fly_stac():
    cfg = compose_config(
        "/root/repo/configs",
        overrides=[
            "model=fly_tethered",
            "stac=stac_fly_tethered",
            # the genuinely rootless tethered body (the stock fly config
            # points at the freejoint _free variant):
            "model.MJCF_PATH=models/fruitfly/fruitfly_force.xml",
            "stac.q_solver=gn-lm",
            "stac.pose_mode=lockstep",
            "stac.skip_part_opt=true",
            "stac.n_frames_per_clip=4",
            "model.N_ITERS=2",
            "model.N_ITER_Q=30",
            "stac.n_fit_frames=8",
        ],
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, "/root/repo")
    if not xml.exists():
        pytest.skip("fly model asset unavailable")
    names = list(cfg.model.KP_NAMES)
    return cfg, Stac(xml, cfg, names)


def test_fly_tethered_is_fixed_root(fly_stac):
    _, stac = fly_stac
    assert stac._fixed, "tethered fly should classify as fixed-root"
    assert not stac._static_cfg.do_root_opt


def test_fly_fixed_root_fit_and_ik_end_to_end(fly_stac):
    """fit_offsets + ik_only through the do_root_opt=False branch, on
    FK-synthesized keypoints (exact registration must be reachable)."""
    cfg, stac = fly_stac
    rng = np.random.default_rng(2)
    qs = np.tile(np.asarray(stac.params.qpos0, np.float32), (8, 1))
    qs += 0.05 * rng.normal(size=qs.shape).astype(np.float32)
    kp = np.asarray(
        jax.vmap(
            lambda q: stac.stac_core_obj.fk(stac.params, q)
            .site_xpos[stac._body_site_idxs]
            .reshape(-1)
        )(jnp.asarray(qs))
    )

    fit = stac.fit_offsets(kp)
    assert np.isfinite(fit.offsets).all()
    fit_resid = np.linalg.norm(
        fit.marker_sites.reshape(8, -1, 3) - kp.reshape(8, -1, 3), axis=-1
    ).mean()
    assert fit_resid < 2e-3, f"fly fit residual {fit_resid}"

    ik = stac.ik_only(kp, fit.offsets)
    ik_resid = np.linalg.norm(
        ik.marker_sites.reshape(8, -1, 3) - kp.reshape(8, -1, 3), axis=-1
    ).mean()
    assert ik_resid < 2e-3, f"fly ik residual {ik_resid}"
