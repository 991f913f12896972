"""CLI tests: arg parsing, override pass-through, print-config, end-to-end.

Mirrors the reference's tests/test_cli.py techniques: parse_args contract
checks plus a monkeypatched pipeline run, and the real end-to-end smoke on
the synth workload at the CLI boundary.
"""

import numpy as np
import pytest
import yaml

from stac_mjx_tpu import cli


def test_parse_args_defaults():
    args, overrides = cli.parse_args([])
    assert args.config_path == "configs"
    assert args.config_name == "config"
    assert not args.print_config
    assert overrides == []


def test_parse_args_passthrough_overrides():
    args, overrides = cli.parse_args(
        ["--config-path", "/x", "stac=synth", "model.FTOL=1e-3", "--cpu"]
    )
    assert args.config_path == "/x"
    assert args.cpu
    assert overrides == ["stac=synth", "model.FTOL=1e-3"]


def test_print_config_roundtrips_yaml(capsys):
    rc = cli.main(
        [
            "--config-path",
            "/root/repo/configs",
            "--print-config",
            "stac=synth",
            "model=synth_data",
        ]
    )
    assert rc == 0
    out = yaml.safe_load(capsys.readouterr().out)
    assert out["model"]["MJCF_PATH"].endswith("synth.xml")
    assert out["stac"]["n_fit_frames"] == 1


def test_main_invokes_pipeline(monkeypatch, tmp_path):
    """main composes the config and hands it to run_pipeline."""
    seen = {}

    def fake_run_pipeline(cfg, base_path, enable_xla=True):
        seen["ftol"] = cfg.model.FTOL
        seen["enable_xla"] = enable_xla
        return tmp_path / "fit.h5", None

    monkeypatch.setattr(cli, "run_pipeline", fake_run_pipeline)
    rc = cli.main(
        [
            "--config-path",
            "/root/repo/configs",
            "--skip-xla-flags",
            "stac=synth",
            "model=synth_data",
            "model.FTOL=0.025",
        ]
    )
    assert rc == 0
    assert seen == {"ftol": 0.025, "enable_xla": False}


def test_cli_end_to_end_synth(tmp_path):
    """The real pipeline through the CLI boundary (reference CI smoke)."""
    rc = cli.main(
        [
            "--config-path",
            "/root/repo/configs",
            "--base-path",
            str(tmp_path),
            "--cpu",
            "stac=stac_synth_data",
            "model=synth_data",
            f"stac.data_path=/root/reference/tests/data/test_synth_1_frames.nwb",
            f"model.MJCF_PATH=/root/repo/models/synth.xml",
        ]
    )
    assert rc == 0
    fit = tmp_path / "synth_fit.h5"
    assert fit.exists() and fit.stat().st_size > 0

    from stac_mjx_tpu import io

    cfg, d = io.load_stac_data(fit)
    assert d.qpos.shape[0] == 1
    assert np.isfinite(d.qpos).all()
