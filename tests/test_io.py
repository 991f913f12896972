"""Data loader tests on real reference mocap files + h5 round-trip."""

import numpy as np
import pytest

from stac_mjx_tpu import io
from stac_mjx_tpu.config import compose_config

from conftest import reference_path


@pytest.fixture(scope="module")
def rodent_cfg():
    return compose_config("configs")


def test_load_nwb_rodent(rodent_cfg):
    rodent_cfg.stac.data_path = reference_path(
        "tests/data/test_rodent_mocap_1000_frames.nwb"
    )
    data, names = io.load_data(rodent_cfg, base_path="/root/repo")
    assert data.shape == (1000, 69)
    assert len(names) == 23
    assert names == list(rodent_cfg.model.KEYPOINT_MODEL_PAIRS.keys())


def test_load_mat_rodent(rodent_cfg):
    rodent_cfg.stac.data_path = reference_path(
        "tests/data/test_rodent_mocap_1000_frames.mat"
    )
    rodent_cfg.model.KP_NAMES_LABEL3D_PATH = reference_path(
        "tests/data/rat23.mat"
    )
    data, names = io.load_data(rodent_cfg, base_path="/root/repo")
    assert data.shape == (1000, 69)
    assert len(names) == 23


def test_mat_nwb_agree(rodent_cfg):
    """Same recording in .mat and .nwb loads to identical arrays."""
    rodent_cfg.stac.data_path = reference_path(
        "tests/data/test_rodent_mocap_1000_frames.nwb"
    )
    nwb, _ = io.load_data(rodent_cfg, base_path="/root/repo")
    rodent_cfg.stac.data_path = reference_path(
        "tests/data/test_rodent_mocap_1000_frames.mat"
    )
    rodent_cfg.model.KP_NAMES_LABEL3D_PATH = reference_path(
        "tests/data/rat23.mat"
    )
    mat, _ = io.load_data(rodent_cfg, base_path="/root/repo")
    np.testing.assert_allclose(np.array(nwb), np.array(mat), atol=1e-10)


def test_load_synth_nwb():
    cfg = compose_config("configs", overrides=["stac=synth", "model=synth_data"])
    cfg.stac.data_path = reference_path("tests/data/test_synth_1_frames.nwb")
    data, names = io.load_data(cfg, base_path="/root/repo")
    assert data.shape == (1, 3)
    assert names == ["part_0"]


def test_kp_name_count_mismatch_raises():
    cfg = compose_config("configs")
    cfg.stac.data_path = reference_path(
        "tests/data/test_rodent_mocap_1000_frames.nwb"
    )
    cfg.model.KEYPOINT_MODEL_PAIRS = {"NotAKeypoint": "pelvis"}
    with pytest.raises(ValueError):
        io.load_data(cfg, base_path="/root/repo")


def test_unsupported_suffix_raises():
    cfg = compose_config("configs")
    cfg.stac.data_path = "something.pickle"
    with pytest.raises(ValueError, match="cannot load '.pickle'"):
        io.load_data(cfg, base_path="/root/repo")


def test_h5_roundtrip(tmp_path):
    cfg = compose_config("configs", overrides=["stac=synth", "model=synth_data"])
    rng = np.random.default_rng(0)
    data = io.StacData(
        qpos=rng.normal(size=(5, 7)),
        xpos=rng.normal(size=(5, 2, 3)),
        xquat=rng.normal(size=(5, 2, 4)),
        marker_sites=rng.normal(size=(5, 1, 3)),
        offsets=rng.normal(size=(1, 3)),
        kp_data=rng.normal(size=(5, 3)),
        names_qpos=["root"] * 7,
        names_xpos=["world", "base"],
        kp_names=["part_0"],
        qvel=rng.normal(size=(5, 6)),
    )
    path = tmp_path / "out.h5"
    io.save_data_to_h5(config=cfg, file_path=path, **data.as_dict())
    cfg2, d2 = io.load_stac_data(path)
    np.testing.assert_allclose(d2.qpos, data.qpos)
    np.testing.assert_allclose(d2.qvel, data.qvel)
    assert d2.kp_names == ["part_0"]
    assert cfg2.model.MJCF_PATH == cfg.model.MJCF_PATH


def test_load_csv(tmp_path):
    """Treadmill CSV loader: <kp>_x/_y/_z columns -> [F, xyz, K] + names."""
    p = tmp_path / "treadmill.csv"
    p.write_text(
        "head_x,head_y,head_z,thorax_x,thorax_y,thorax_z\n"
        "1,2,3,4,5,6\n"
        "7,8,9,10,11,12\n"
    )
    data, names = io.load_csv(p)
    assert names == ["head", "thorax"]
    assert data.shape == (2, 3, 2)
    np.testing.assert_allclose(data[0, :, 0], [1, 2, 3])
    np.testing.assert_allclose(data[1, :, 1], [10, 11, 12])

    # explicit name order is respected
    data2, names2 = io.load_csv(p, kp_names=["thorax", "head"])
    np.testing.assert_allclose(data2[0, :, 0], [4, 5, 6])

    with pytest.raises(ValueError, match="missing keypoint columns"):
        io.load_csv(p, kp_names=["head", "abdomen"])
