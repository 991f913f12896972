"""Model-zoo tests: every shipped model config composes, builds a Stac, and
its FK agrees with MuJoCo's C kinematics on the compiled fit model.

Mirrors the reference's integration/test_model.py technique (compile the real
model, assert structural consistency) across the full species zoo, using the
reference checkout's MJCF assets as data.
"""

import mujoco
import numpy as np
import pytest

from conftest import reference_path

from stac_mjx_tpu.config import compose_config
from stac_mjx_tpu.stac import Stac
from stac_mjx_tpu.utils.assets import resolve_asset

ZOO = [
    # (model group name, expected n_keypoints, has_root_opt)
    ("rodent", 23, True),
    ("mouse", 34, True),
    ("celegans", 25, False),
    ("fly_tethered", 30, False),
    ("fly_treadmill", 9, True),
    ("synth_data", 1, True),
]


@pytest.fixture(scope="module", params=[z[0] for z in ZOO])
def zoo_stac(request):
    name = request.param
    n_kp, has_root = next((k, r) for n, k, r in ZOO if n == name)
    cfg = compose_config("/root/repo/configs", overrides=[f"model={name}"])
    xml = resolve_asset(cfg.model.MJCF_PATH, "/root/repo")
    if not xml.exists():
        pytest.skip(f"model asset unavailable: {cfg.model.MJCF_PATH}")
    names = list(cfg.model.KP_NAMES)
    return name, n_kp, has_root, cfg, Stac(xml, cfg, names)


def test_zoo_builds_with_expected_sites(zoo_stac):
    name, n_kp, has_root, cfg, stac = zoo_stac
    assert len(stac._body_site_idxs) == n_kp
    assert len(list(cfg.model.KEYPOINT_MODEL_PAIRS.keys())) == n_kp
    # Root classification drives the root-opt phase (ref stac.py:151-155).
    assert (stac._root_kp_idx >= 0) == (
        "ROOT_OPTIMIZATION_KEYPOINT" in cfg.model
        and cfg.model.get("ROOT_OPTIMIZATION_KEYPOINT") is not None
    )


def test_zoo_fk_matches_mujoco(zoo_stac):
    """Site world positions from our FK == mj_kinematics on the fit model."""
    name, n_kp, has_root, cfg, stac = zoo_stac
    m = stac._mj_model
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    q = np.array(m.qpos0, dtype=np.float64)
    q += 0.05 * rng.normal(size=q.shape)
    # Re-normalize any quaternion coordinates so both engines agree on the
    # normalization-free comparison point.
    for j in range(m.njnt):
        if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
            a = m.jnt_qposadr[j] + 3
            q[a : a + 4] /= np.linalg.norm(q[a : a + 4])
        elif m.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
            a = m.jnt_qposadr[j]
            q[a : a + 4] /= np.linalg.norm(q[a : a + 4])
    d.qpos[:] = q
    mujoco.mj_kinematics(m, d)

    import jax.numpy as jnp

    res = stac.stac_core_obj.fk(stac.params, jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(res.site_xpos), d.site_xpos, atol=2e-5
    )


def test_zoo_part_masks_match_reference_semantics(zoo_stac):
    """Part masks = substring match of group entries against per-qpos joint
    names — the reference's get_part_ids (stac_mjx/stac.py:169-171). Note this
    legitimately yields all-empty masks for models whose groups list *body*
    names that never substring-match any joint name (celegans): the reference
    then runs no-op part solves, and so do we.
    """
    name, n_kp, has_root, cfg, stac = zoo_stac
    parts = cfg.model.get("INDIVIDUAL_PART_OPTIMIZATION")
    if not parts or not len(list(parts.keys())):
        pytest.skip("no part groups for this model")
    groups = {k: list(v) for k, v in parts.items()}
    assert len(stac._indiv_parts) == len(groups)
    for mask, entries in zip(stac._indiv_parts, groups.values()):
        expected = np.array(
            [any(p in nm for p in entries) for nm in stac._part_names]
        )
        np.testing.assert_array_equal(np.asarray(mask), expected)


def test_skip_part_opt_drops_refinement_passes():
    """stac.skip_part_opt=true compiles the fit/ik programs without the
    per-part refinement solves (the gn-mode throughput configuration)."""
    cfg = compose_config(
        "/root/repo/configs",
        overrides=["model=rodent", "stac.skip_part_opt=true", "stac.q_solver=gn"],
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, "/root/repo")
    stac = Stac(xml, cfg, list(cfg.model.KP_NAMES))
    assert stac._static_cfg.indiv_parts == ()
    assert len(stac._indiv_parts) == 5  # masks still built for introspection
