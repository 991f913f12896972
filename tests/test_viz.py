"""Viz tests: real headless render of a fitted output + validation paths.

Unlike the reference's fully-mocked viz test (tests/unit/test_viz.py there),
the synth model is small enough to drive the actual EGL renderer in CI.
"""

import numpy as np
import pytest

from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils.assets import resolve_asset
from stac_mjx_tpu.viz import render_stac


@pytest.fixture(scope="module")
def synth_stac():
    cfg = compose_config(
        "/root/repo/configs", overrides=["stac=synth", "model=synth_data"]
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, "/root/repo")
    return Stac(xml, cfg, list(cfg.model.KP_NAMES))


def _egl_available():
    try:
        import mujoco

        ctx = mujoco.egl.GLContext(64, 64)
        ctx.free()
        return True
    except Exception:
        return False


def test_render_stac_writes_video(synth_stac, tmp_path):
    if not _egl_available():
        pytest.skip("no EGL device available")
    stac = synth_stac
    qposes = np.tile(np.asarray(stac.params.qpos0), (3, 1))
    kp_data = np.zeros((3, 3), dtype=np.float32)
    out = tmp_path / "render.mp4"
    frames = render_stac(
        stac,
        qposes,
        kp_data,
        np.asarray(stac._offsets),
        n_frames=2,
        save_path=out,
        camera=0,
        height=240,
        width=320,
        show_marker_error=True,
    )
    assert len(frames) == 2
    assert frames[0].shape == (240, 320, 3)
    assert out.exists() and out.stat().st_size > 0


def test_render_stac_length_mismatch_raises(synth_stac, tmp_path):
    stac = synth_stac
    qposes = np.zeros((2, stac.topo.nq))
    kp_data = np.zeros((3, 3))
    with pytest.raises(ValueError, match="not equal"):
        render_stac(
            stac, qposes, kp_data, np.asarray(stac._offsets), 1, tmp_path / "x.mp4"
        )


def test_render_stac_frame_range_raises(synth_stac, tmp_path):
    stac = synth_stac
    qposes = np.zeros((3, stac.topo.nq))
    kp_data = np.zeros((3, 3))
    with pytest.raises(ValueError, match="start_frame"):
        render_stac(
            stac,
            qposes,
            kp_data,
            np.asarray(stac._offsets),
            n_frames=3,
            save_path=tmp_path / "x.mp4",
            start_frame=1,
        )
