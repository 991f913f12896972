"""Format-conversion tests: mat→nwb writer round-trips through our loaders.

Covers the reference's Mat-to-Nwb / view_nwb notebook functionality
(demos/Mat-to-Nwb.ipynb, demos/view_nwb.ipynb) as a first-party subsystem.
"""

import numpy as np
import pytest
import scipy.io as spio

from conftest import reference_path

from stac_mjx_tpu import io
from stac_mjx_tpu.utils import convert


def _synthetic_recording(n_frames=7, n_kp=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_frames, 3, n_kp))


def test_save_nwb_roundtrip(tmp_path):
    data = _synthetic_recording()
    names = [f"part_{i}" for i in range(data.shape[2])]
    out = convert.save_nwb(tmp_path / "rec.nwb", data, names, fps=25.0)

    loaded, loaded_names = io.load_nwb(out)
    assert loaded_names == names
    np.testing.assert_allclose(loaded, data)


def test_save_nwb_validates_shapes(tmp_path):
    with pytest.raises(ValueError, match="frames, xyz, keypoints"):
        convert.save_nwb(tmp_path / "x.nwb", np.zeros((5, 4, 2)), ["a", "b"])
    with pytest.raises(ValueError, match="names"):
        convert.save_nwb(tmp_path / "x.nwb", np.zeros((5, 3, 2)), ["a"])


def test_mat_to_nwb_roundtrip(tmp_path):
    data = _synthetic_recording(n_frames=11, n_kp=3)
    mat_path = tmp_path / "rec.mat"
    spio.savemat(mat_path, {"pred": data})

    out = convert.mat_to_nwb(mat_path, tmp_path / "rec.nwb")
    loaded, names = io.load_nwb(out)
    assert names == ["kp_0", "kp_1", "kp_2"]
    np.testing.assert_allclose(loaded, data)


def test_mat_to_nwb_with_label3d_names(tmp_path):
    """Keypoint names flow from a label3d joint_names file like the reference."""
    data = _synthetic_recording(n_frames=3, n_kp=2)
    mat_path = tmp_path / "rec.mat"
    spio.savemat(mat_path, {"pred": data})
    names_path = tmp_path / "names.mat"
    spio.savemat(
        names_path,
        {"joint_names": np.array([["snout"], ["tail"]], dtype=object)},
    )

    out = convert.mat_to_nwb(mat_path, tmp_path / "rec.nwb", names_path=names_path)
    _, names = io.load_nwb(out)
    assert names == ["snout", "tail"]


def test_mat_to_nwb_real_rodent_recording(tmp_path):
    """Convert the reference's real rodent .mat and read it back."""
    mat = reference_path("tests/data/test_rodent_mocap_1000_frames.mat")
    names = reference_path("tests/data/rat23.mat")
    out = convert.mat_to_nwb(mat, tmp_path / "rodent.nwb", names_path=names)
    data, node_names = io.load_nwb(out)
    assert data.shape == (1000, 3, 23)
    assert len(node_names) == 23


def test_describe_nwb(tmp_path, capsys):
    data = _synthetic_recording(n_frames=9, n_kp=2)
    out = convert.save_nwb(tmp_path / "rec.nwb", data, ["a", "b"], fps=10.0)
    info = convert.describe_nwb(out)
    assert info["n_frames"] == 9
    assert info["nodes"] == ["a", "b"]
    assert info["series"]["a"]["shape"] == (9, 3)
    assert info["series"]["a"]["duration_s"] == pytest.approx(0.8)
    assert "2 keypoints, 9 frames" in capsys.readouterr().out


def test_describe_reference_nwb():
    """The viewer reads reference-produced (pynwb-written) files too."""
    info = convert.describe_nwb(
        reference_path("tests/data/test_synth_1_frames.nwb")
    )
    assert info["n_frames"] == 1
    assert len(info["nodes"]) == 1
