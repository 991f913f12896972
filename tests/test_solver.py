"""Solver tests: projected gradient ground truth + closed-form m-phase.

Mirrors the reference's numerical ground-truth technique
(tests/unit/test_m_opt.py there): build a minimal chain, generate keypoints
by FK with known parameters, assert recovery.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from stac_mjx_tpu.models.builder import extract_model
from stac_mjx_tpu.ops.solver import ProjectedGradient, m_opt_closed_form, project_box
from stac_mjx_tpu.ops.stac_core import StacCore, make_qs

CHAIN_XML = """
<mujoco><worldbody>
  <body name="b1" pos="0 0 0.1">
    <joint name="j1" type="hinge" axis="0 0 1" range="-3 3"/>
    <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
    <site name="s1" pos="0.05 0.01 0"/>
    <body name="b2" pos="0.1 0 0">
      <joint name="j2" type="hinge" axis="0 1 0" range="-3 3"/>
      <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
      <site name="s2" pos="0.05 -0.01 0.02"/>
      <body name="b3" pos="0.1 0 0">
        <joint name="j3" type="hinge" axis="1 0 0" range="-3 3"/>
        <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
        <site name="s3" pos="0.08 0 0.01"/>
      </body>
    </body>
  </body>
</worldbody></mujoco>
"""


@pytest.fixture(scope="module")
def chain():
    m = mujoco.MjModel.from_xml_string(CHAIN_XML)
    topo, params = extract_model(m)
    core = StacCore(topo, np.arange(3), tol=1e-9, n_iter_q=400)
    return m, topo, params, core


def test_pg_quadratic_exact():
    """Unconstrained quadratic: PG converges to the analytic minimum."""
    A = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    b = jnp.array([1.0, -2.0])
    x_star = jnp.linalg.solve(A, b)
    pg = ProjectedGradient(maxiter=500, tol=1e-10)
    res = pg.run(
        lambda x: 0.5 * x @ A @ x - b @ x,
        jnp.zeros(2),
        -10 * jnp.ones(2),
        10 * jnp.ones(2),
    )
    # f32 precision floor: the same solve reaches 1e-9 under x64
    np.testing.assert_allclose(np.array(res.params), np.array(x_star), atol=2e-3)


def test_pg_active_box_constraint():
    """Minimum outside the box: solution lands on the boundary."""
    pg = ProjectedGradient(maxiter=200, tol=1e-10)
    res = pg.run(
        lambda x: jnp.sum((x - 5.0) ** 2), jnp.zeros(3), -jnp.ones(3), jnp.ones(3)
    )
    np.testing.assert_allclose(np.array(res.params), np.ones(3), atol=1e-7)


def test_pg_vmap_lockstep():
    """vmapped solves converge per-lane despite shared while_loop."""
    pg = ProjectedGradient(maxiter=300, tol=1e-10)
    targets = jnp.array([[0.5, -0.5], [2.0, 0.1], [-0.7, 0.9]])

    def solve(t):
        return pg.run(
            lambda x: jnp.sum((x - t) ** 2),
            jnp.zeros(2),
            -jnp.ones(2),
            jnp.ones(2),
        ).params

    out = jax.vmap(solve)(targets)
    expected = np.clip(np.array(targets), -1, 1)
    np.testing.assert_allclose(np.array(out), expected, atol=1e-6)


def test_q_opt_recovers_pose(chain):
    m, topo, params, core = chain
    q_true = jnp.array([0.6, -0.3, 0.4])
    kp = core.fk(params, q_true).site_xpos.reshape(-1)
    lb, ub = -3 * jnp.ones(3), 3 * jnp.ones(3)
    res = jax.jit(core.q_opt)(
        params, kp, jnp.ones(3, bool), jnp.ones(9), jnp.zeros(3), lb, ub
    )
    # loss in m^2 over 3 sites; f32 floor leaves ~1e-6 (sub-mm residuals)
    assert float(res.value) < 5e-6


def test_q_opt_masked(chain):
    """Only the masked joint moves; others keep q0 through make_qs."""
    m, topo, params, core = chain
    q_true = jnp.array([0.7, -0.4, 1.1])
    kp = core.fk(params, q_true).site_xpos.reshape(-1)
    q0 = jnp.array([0.7, 0.0, 1.1])
    mask = jnp.array([False, True, False])
    res = jax.jit(core.q_opt)(
        params, kp, mask, jnp.ones(9), q0, -3 * jnp.ones(3), 3 * jnp.ones(3)
    )
    qf = make_qs(q0, mask, res.params)
    np.testing.assert_allclose(np.array(qf), [0.7, -0.4, 1.1], atol=1e-4)


def test_m_opt_recovers_offsets(chain):
    m, topo, params, core = chain
    true_off = jnp.array(
        [[0.02, 0.0, 0.01], [0.0, 0.015, -0.01], [-0.01, 0.02, 0.0]]
    )
    p2 = params.set_site_pos(true_off, jnp.arange(3))
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.uniform(-1, 1, (40, 3)), jnp.float32)
    kps = jax.vmap(lambda q: core.fk(p2, q).site_xpos.reshape(-1))(qs)
    res = core.m_opt(params, kps, qs, jnp.zeros((3, 3)), jnp.zeros((3, 3)), 0.0)
    np.testing.assert_allclose(np.array(res.params), np.array(true_off), atol=1e-5)
    assert float(res.error) < 1e-8


def test_m_opt_regularization_extremes(chain):
    """reg=0 ignores m0; huge reg pins regularized coords to m0."""
    m, topo, params, core = chain
    true_off = jnp.array(
        [[0.02, 0.0, 0.01], [0.0, 0.015, -0.01], [-0.01, 0.02, 0.0]]
    )
    p2 = params.set_site_pos(true_off, jnp.arange(3))
    rng = np.random.default_rng(1)
    qs = jnp.asarray(rng.uniform(-1, 1, (30, 3)), jnp.float32)
    kps = jax.vmap(lambda q: core.fk(p2, q).site_xpos.reshape(-1))(qs)

    m0 = jnp.full((3, 3), 0.5)
    res0 = core.m_opt(params, kps, qs, m0, jnp.ones((3, 3)), 0.0)
    np.testing.assert_allclose(np.array(res0.params), np.array(true_off), atol=1e-5)

    res_inf = core.m_opt(params, kps, qs, m0, jnp.ones((3, 3)), 1e9)
    np.testing.assert_allclose(np.array(res_inf.params), np.array(m0), atol=1e-4)

    # partial mask: only site 0 regularized
    mask = jnp.zeros((3, 3)).at[0].set(1.0)
    res_p = core.m_opt(params, kps, qs, m0, mask, 1e9)
    np.testing.assert_allclose(np.array(res_p.params[0]), np.array(m0[0]), atol=1e-4)
    np.testing.assert_allclose(
        np.array(res_p.params[1:]), np.array(true_off[1:]), atol=1e-5
    )


def test_m_opt_closed_form_identity_pose():
    """With identity rotations, m* = mean(y - p) when unregularized."""
    T, K = 7, 2
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.normal(size=(T, K, 3)), jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (T, K, 3, 3))
    m_true = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    y = p + m_true
    res = m_opt_closed_form(p, R, y, jnp.zeros((K, 3)), jnp.zeros((K, 3)), 0.0)
    np.testing.assert_allclose(np.array(res.params), np.array(m_true), atol=1e-6)


def test_project_box():
    x = jnp.array([-5.0, 0.5, 5.0])
    out = project_box(x, -jnp.ones(3), jnp.ones(3))
    np.testing.assert_allclose(np.array(out), [-1.0, 0.5, 1.0])
