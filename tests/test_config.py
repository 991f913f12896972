"""Config composition, overrides, validation, and reference compatibility."""

import pytest

from stac_mjx_tpu.config import compose_config, config_from_dict

from conftest import reference_path


def test_compose_defaults():
    cfg = compose_config("configs")
    assert cfg.model.MJCF_PATH == "models/rodent.xml"
    assert cfg.stac.n_fit_frames == 10
    assert cfg.stac.mujoco.solver == "newton"


def test_group_override():
    cfg = compose_config("configs", overrides=["stac=synth", "model=synth_data"])
    assert cfg.model.MJCF_PATH == "models/synth.xml"
    assert cfg.stac.n_fit_frames == 1


def test_dotted_overrides():
    cfg = compose_config(
        "configs", overrides=["stac.n_fit_frames=3", "model.N_ITERS=2"]
    )
    assert cfg.stac.n_fit_frames == 3
    assert cfg.model.N_ITERS == 2


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown key"):
        compose_config("configs", overrides=["stac.bogus=1"])


def test_missing_required_rejected():
    with pytest.raises(ValueError, match="missing required"):
        config_from_dict({"model": {}, "stac": {}})


def test_node_protocols():
    cfg = compose_config("configs")
    assert "ROOT_OPTIMIZATION_KEYPOINT" in cfg.model
    assert cfg.model.get("NOT_A_KEY", 42) == 42
    # round-trips through yaml
    text = cfg.to_yaml()
    assert "KEYPOINT_MODEL_PAIRS" in text


def test_reference_config_tree_loads():
    """The reference's own Hydra config directory composes unchanged."""
    ref_configs = reference_path("configs")
    cfg = compose_config(ref_configs)
    assert cfg.model.MJCF_PATH == "models/rodent.xml"
    assert cfg.model.N_ITERS == 6
    cfg2 = compose_config(
        ref_configs, overrides=["stac=stac_synth_data", "model=synth_data"]
    )
    assert cfg2.model.MJCF_PATH == "models/synth_model.xml"


def test_gn_solver_knobs_plumb_to_gnik():
    """gn_damping_rule / gn_iters / gn_stall_iters reach the GNIK instance,
    and gn_iters=0 resolves to the measured auto schedule (14 nielsen
    iterations for gn-lm; see config.py StacConfig.gn_iters)."""
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    cfg = compose_config(
        "configs",
        overrides=["stac=synth", "model=synth_data",
                   "stac.q_solver=gn-lm", "stac.pose_mode=lockstep"],
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, ".")
    names = list(cfg.model.KEYPOINT_MODEL_PAIRS.keys())
    gnik = Stac(xml, cfg, names).stac_core_obj.gnik
    assert gnik.damping_rule == "nielsen"
    assert gnik.maxiter == 14
    assert gnik.stall_iters == 0

    cfg2 = compose_config(
        "configs",
        overrides=["stac=synth", "model=synth_data",
                   "stac.q_solver=gn-lm", "stac.pose_mode=lockstep",
                   "stac.gn_damping_rule=fixed", "stac.gn_iters=11",
                   "stac.gn_stall_iters=2"],
    )
    gnik2 = Stac(xml, cfg2, names).stac_core_obj.gnik
    assert gnik2.damping_rule == "fixed"
    assert gnik2.maxiter == 11
    assert gnik2.stall_iters == 2
