"""Failure containment + error-semantics tests (VERDICT r1 items 7/8).

- Non-finite keypoints must not corrupt the pose: every q_solver keeps the
  previous (finite) iterate, mirroring the reference's solver-failure
  fallback that restores q0 on a raised error
  (stac_mjx/stac_core.py:93-99 + utils.py:147-169).
- The pipeline's reported per-frame error is the mean marker Euclidean
  distance (meters), identical in meaning for every q_solver
  (pipeline.pose_optimization docstring).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from stac_mjx_tpu import pipeline
from stac_mjx_tpu.models.builder import extract_model
from stac_mjx_tpu.ops.stac_core import StacCore

CHAIN_XML = """
<mujoco><worldbody>
  <body name="root" pos="0 0 0.3">
    <freejoint/>
    <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
    <site name="s0" pos="0.02 0.01 0.03"/>
    <body name="b1" pos="0.1 0 0">
      <joint name="j1" type="hinge" axis="0 0 1" range="-3 3"/>
      <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
      <site name="s1" pos="0.05 0.01 0"/>
    </body>
  </body>
</worldbody></mujoco>
"""

SOLVERS = ["pg", "pg-jaxopt", "gn", "gn-lm"]


@pytest.fixture(scope="module")
def chain():
    m = mujoco.MjModel.from_xml_string(CHAIN_XML)
    topo, params = extract_model(m)
    lb = np.full(topo.nq, -3.0, np.float32)
    ub = np.full(topo.nq, 3.0, np.float32)
    lb[:3], ub[:3] = -np.inf, np.inf
    lb[3:7], ub[3:7] = -1.0, 1.0
    return topo, params, jnp.asarray(lb), jnp.asarray(ub)


def _core(topo, solver):
    return StacCore(topo, np.arange(2), tol=1e-8, n_iter_q=40, q_solver=solver)


@pytest.mark.parametrize("solver", SOLVERS)
def test_nan_keypoints_keep_previous_iterate(chain, solver):
    topo, params, lb, ub = chain
    core = _core(topo, solver)
    q0 = params.qpos0
    kp_nan = jnp.full((2 * 3,), jnp.nan, jnp.float32)
    qs = jnp.ones(topo.nq, bool)
    kmask = jnp.ones(6, jnp.float32)
    res = jax.jit(core.q_opt)(params, kp_nan, qs, kmask, q0, lb, ub)
    out = np.asarray(res.params)
    assert np.isfinite(out).all(), f"{solver}: non-finite params leaked"
    np.testing.assert_allclose(out, np.asarray(q0), atol=1e-6)


@pytest.mark.parametrize("solver", SOLVERS)
def test_inf_keypoints_keep_previous_iterate(chain, solver):
    topo, params, lb, ub = chain
    core = _core(topo, solver)
    q0 = params.qpos0
    kp_inf = jnp.full((2 * 3,), jnp.inf, jnp.float32)
    qs = jnp.ones(topo.nq, bool)
    kmask = jnp.ones(6, jnp.float32)
    res = jax.jit(core.q_opt)(params, kp_inf, qs, kmask, q0, lb, ub)
    assert np.isfinite(np.asarray(res.params)).all()


def _mini_cfg(pose_mode="lockstep"):
    return pipeline.StacConfigStatic(
        n_iters=1,
        n_sample_frames=2,
        m_reg_coef=1.0,
        root_kp_idx=-1,
        root_dims=7,
        do_root_opt=False,
        indiv_parts=(),
        trunk_kps=np.ones(2, bool),
        pose_mode=pose_mode,
    )


def test_reported_error_is_marker_distance_for_every_solver(chain):
    """pipeline errors == mean marker distance, computed independently."""
    topo, params, lb, ub = chain
    rng = np.random.default_rng(3)
    q_true = np.asarray(params.qpos0, np.float32).copy()
    q_true[7] = 0.4
    ref_core = _core(topo, "gn")
    kp = np.asarray(
        jax.jit(ref_core.fk)(params, jnp.asarray(q_true)).site_xpos[
            np.arange(2)
        ]
    ).reshape(-1)
    kp_batch = jnp.asarray(np.tile(kp, (3, 1)), jnp.float32)

    per_solver = {}
    for solver in SOLVERS:
        core = _core(topo, solver)
        cfg = _mini_cfg("lockstep" if solver == "gn-lm" else "sequential")
        _, qposes, _, _, markers, errors = jax.jit(
            lambda p, k: pipeline.pose_optimization(
                core, cfg, p, k, p.qpos0, lb, ub
            )
        )(params, kp_batch)
        manual = np.linalg.norm(
            np.asarray(kp_batch).reshape(3, 2, 3) - np.asarray(markers),
            axis=-1,
        ).mean(axis=-1)
        np.testing.assert_allclose(np.asarray(errors), manual, rtol=1e-5)
        per_solver[solver] = float(np.mean(np.asarray(errors)))

    vals = list(per_solver.values())
    # All solvers minimize the same objective on an exactly-realizable
    # target, so the reported quality agrees across solvers (same meaning).
    assert max(vals) < 5e-3, per_solver
