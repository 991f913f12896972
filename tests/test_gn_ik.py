"""Gauss-Newton IK tests: analytic Jacobian vs finite differences, pose
recovery, and the masking invariant (masked qpos coordinates hold q0).

Same ground-truth technique as the reference's solver tests
(tests/unit/test_m_opt.py there): synthesize keypoints by FK at a known pose
and assert recovery, but exercised through the analytic-Jacobian GN solver.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from stac_mjx_tpu.models.builder import extract_model
from stac_mjx_tpu.ops.gn_ik import GNIK
from stac_mjx_tpu.ops.stac_core import StacCore

# Chain with a free root + hinges on distinct axes: covers world-translation,
# local-rotation (quaternion) and scalar-hinge dof columns of the Jacobian.
FREE_CHAIN_XML = """
<mujoco><worldbody>
  <body name="root" pos="0 0 0.3">
    <freejoint/>
    <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
    <site name="s0" pos="0.02 0.01 0.03"/>
    <body name="b1" pos="0.1 0 0">
      <joint name="j1" type="hinge" axis="0 0 1" range="-3 3"/>
      <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
      <site name="s1" pos="0.05 0.01 0"/>
      <body name="b2" pos="0.1 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-3 3"/>
        <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
        <site name="s2" pos="0.05 -0.01 0.02"/>
      </body>
    </body>
  </body>
</worldbody></mujoco>
"""


@pytest.fixture(scope="module")
def free_chain():
    m = mujoco.MjModel.from_xml_string(FREE_CHAIN_XML)
    topo, params = extract_model(m)
    core = StacCore(topo, np.arange(3), tol=1e-12, n_iter_q=400)
    gn = GNIK(topo, np.arange(3), maxiter=20, tol=1e-18)
    return topo, params, core, gn


def _rand_q(topo, params, rng, scale=0.2):
    q = np.asarray(params.qpos0, np.float64).copy()
    q += scale * rng.normal(size=q.shape)
    q[3:7] /= np.linalg.norm(q[3:7])
    return q


def test_jacobian_matches_finite_differences(free_chain):
    topo, params, core, gn = free_chain
    rng = np.random.default_rng(0)
    q = jnp.asarray(_rand_q(topo, params, rng))

    J = np.asarray(gn.jacobian(core.fk(params, q)))

    def sites_of(delta):
        qq = gn.retract(q, jnp.asarray(delta))
        return np.asarray(core.fk(params, qq).site_xpos[:3].reshape(-1))

    # eps/atol sized for the suite's f32 regime (central FD noise ~1e-3);
    # the same comparison under x64 with eps=1e-6 agrees to 4e-11.
    eps = 1e-3
    J_fd = np.zeros_like(J)
    for d in range(gn.nv):
        e = np.zeros(gn.nv)
        e[d] = eps
        J_fd[:, d] = (sites_of(e) - sites_of(-e)) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=2e-3)


def test_gn_recovers_pose(free_chain):
    topo, params, core, gn = free_chain
    rng = np.random.default_rng(1)
    q_true = jnp.asarray(_rand_q(topo, params, rng, scale=0.3))
    kp = core.fk(params, q_true).site_xpos[:3].reshape(-1)

    nq = topo.nq
    res = gn.solve(
        params,
        kp,
        jnp.ones(nq, bool),
        jnp.ones(kp.shape[0], kp.dtype),
        params.qpos0,
        -jnp.full(nq, jnp.inf),
        jnp.full(nq, jnp.inf),
    )
    markers = core.fk(params, res.params).site_xpos[:3].reshape(-1)
    # f32 floor; same solve reaches <1e-8 under x64.
    np.testing.assert_allclose(np.asarray(markers), np.asarray(kp), atol=1e-4)


def test_gn_masked_coords_hold_q0(free_chain):
    """Masked-out qpos coordinates must keep their initial values exactly."""
    topo, params, core, gn = free_chain
    rng = np.random.default_rng(2)
    q_true = jnp.asarray(_rand_q(topo, params, rng, scale=0.3))
    kp = core.fk(params, q_true).site_xpos[:3].reshape(-1)

    nq = topo.nq
    mask = np.ones(nq, bool)
    mask[7:] = False  # freeze both hinges; optimize the free root only
    q0 = params.qpos0
    res = gn.solve(
        params,
        kp,
        jnp.asarray(mask),
        jnp.ones(kp.shape[0], kp.dtype),
        q0,
        -jnp.full(nq, jnp.inf),
        jnp.full(nq, jnp.inf),
    )
    np.testing.assert_array_equal(np.asarray(res.params)[7:], np.asarray(q0)[7:])
    assert not np.allclose(np.asarray(res.params)[:3], np.asarray(q0)[:3])


def test_gn_respects_bounds(free_chain):
    topo, params, core, gn = free_chain
    rng = np.random.default_rng(3)
    q_true = jnp.asarray(_rand_q(topo, params, rng, scale=0.5))
    kp = core.fk(params, q_true).site_xpos[:3].reshape(-1)

    nq = topo.nq
    lb = np.full(nq, -np.inf)
    ub = np.full(nq, np.inf)
    lb[7:] = -0.05  # tight hinge box
    ub[7:] = 0.05
    res = gn.solve(
        params,
        kp,
        jnp.ones(nq, bool),
        jnp.ones(kp.shape[0], kp.dtype),
        params.qpos0,
        jnp.asarray(lb, kp.dtype),
        jnp.asarray(ub, kp.dtype),
    )
    q = np.asarray(res.params)
    assert (q[7:] >= -0.05 - 1e-6).all() and (q[7:] <= 0.05 + 1e-6).all()


def test_gn_through_stac_core_vmap(free_chain):
    """StacCore(q_solver='gn') jit+vmaps across frames and beats the PG loss."""
    topo, params, core_pg, _ = free_chain
    core_gn = StacCore(topo, np.arange(3), tol=1e-6, n_iter_q=50, q_solver="gn")
    rng = np.random.default_rng(4)
    F = 4
    nq = topo.nq
    q_true = np.stack([_rand_q(topo, params, rng, scale=0.3) for _ in range(F)])
    kp = jax.vmap(lambda q: core_pg.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true)
    )

    qs_all = jnp.ones(nq, bool)
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)

    solve = jax.jit(
        jax.vmap(
            lambda kp_t: core_gn.q_opt(
                params, kp_t, qs_all, kmask, params.qpos0, lb, ub
            ).value
        )
    )
    losses = np.asarray(solve(kp))
    assert (losses < 1e-6).all()


def test_gn_flat_lm_recovers_pose(free_chain):
    """linesearch=False (flat LM): same recovery contract as the default."""
    topo, params, core, _ = free_chain
    gn = GNIK(topo, np.arange(3), maxiter=20, tol=1e-18, linesearch=False)
    rng = np.random.default_rng(5)
    q_true = jnp.asarray(_rand_q(topo, params, rng, scale=0.3))
    kp = core.fk(params, q_true).site_xpos[:3].reshape(-1)
    nq = topo.nq
    res = gn.solve(
        params,
        kp,
        jnp.ones(nq, bool),
        jnp.ones(kp.shape[0], kp.dtype),
        params.qpos0,
        -jnp.full(nq, jnp.inf),
        jnp.full(nq, jnp.inf),
    )
    markers = core.fk(params, res.params).site_xpos[:3].reshape(-1)
    np.testing.assert_allclose(np.asarray(markers), np.asarray(kp), atol=2e-4)


def test_solve_batch_per_item_masks_match_shared(free_chain):
    """(F, nq) qs_to_opt rows equal to a shared (nq,) mask reproduce the
    shared-mask solve exactly — and mixed rows reproduce the corresponding
    separate shared-mask solves item-for-item (the batched part-opt
    contract; pipeline.pose_optimization part_opt_mode='batched')."""
    topo, params, core, _ = free_chain
    gn = GNIK(topo, np.arange(3), maxiter=12, tol=1e-18, linesearch=False)
    rng = np.random.default_rng(7)
    nq = topo.nq
    F = 6
    q_true = np.stack([_rand_q(topo, params, rng, 0.25) for _ in range(F)])
    kp = jax.vmap(lambda q: core.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true, jnp.float32)
    )
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    q0 = jnp.broadcast_to(params.qpos0, (F, nq))
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)

    mask_a = jnp.ones(nq, bool)  # everything
    mask_b = jnp.zeros(nq, bool).at[7:].set(True)  # hinges only

    # Replicated per-item mask == shared mask.
    shared = gn.solve_batch(params, kp, mask_a, kmask, q0, lb, ub)
    per_item = gn.solve_batch(
        params, kp, jnp.broadcast_to(mask_a, (F, nq)), kmask, q0, lb, ub
    )
    # not bitwise: the (F, nv) vs (1, nv) dof-mask broadcast changes XLA's
    # fusion choices, so the converged iterates differ by f32 roundoff
    np.testing.assert_allclose(
        np.asarray(per_item.params), np.asarray(shared.params), atol=1e-5
    )

    # Mixed rows == the separate shared solves, item-for-item.
    mixed_masks = jnp.stack([mask_a, mask_b, mask_a, mask_b, mask_b, mask_a])
    mixed = gn.solve_batch(params, kp, mixed_masks, kmask, q0, lb, ub)
    only_b = gn.solve_batch(params, kp, mask_b, kmask, q0, lb, ub)
    want = np.where(
        np.asarray(mixed_masks[:, :1]),  # rows of mask_a start all-True
        np.asarray(shared.params),
        np.asarray(only_b.params),
    )
    np.testing.assert_allclose(np.asarray(mixed.params), want, atol=1e-5)
    # masked-out coordinates hold q0 up to quaternion renormalization
    b_rows = np.asarray(mixed.params)[np.asarray(mixed_masks[:, 0]) == 0]
    np.testing.assert_allclose(
        b_rows[:, :3], np.asarray(q0[: b_rows.shape[0], :3]), atol=1e-6
    )


def test_solve_batch_per_item_masks_lane_padding(free_chain):
    """Per-item masks survive the internal lane padding (F not a multiple
    of the Pallas lane tile): results equal the per-item solve at a padded
    size."""
    topo, params, core, _ = free_chain
    gn = GNIK(topo, np.arange(3), maxiter=8, tol=1e-18, linesearch=False)
    rng = np.random.default_rng(8)
    nq = topo.nq
    F = 3  # far below LANE -> exercises the pad/broadcast of qs_to_opt
    q_true = np.stack([_rand_q(topo, params, rng, 0.2) for _ in range(F)])
    kp = jax.vmap(lambda q: core.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true, jnp.float32)
    )
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    q0 = jnp.broadcast_to(params.qpos0, (F, nq))
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)
    masks = jnp.stack(
        [
            jnp.ones(nq, bool),
            jnp.zeros(nq, bool).at[7:].set(True),
            jnp.zeros(nq, bool).at[:7].set(True),
        ]
    )
    res = gn.solve_batch(params, kp, masks, kmask, q0, lb, ub)
    for f in range(F):
        single = gn.solve_batch(
            params, kp[f : f + 1], masks[f], kmask, q0[f : f + 1], lb, ub
        )
        np.testing.assert_allclose(
            np.asarray(res.params[f]), np.asarray(single.params[0]), atol=1e-6
        )


def test_gn_lm_through_stac_core(free_chain):
    """StacCore(q_solver='gn-lm') routes to the flat-LM schedule."""
    topo, params, core_pg, _ = free_chain
    core = StacCore(topo, np.arange(3), tol=1e-6, n_iter_q=50, q_solver="gn-lm")
    assert core.gnik.linesearch is False
    rng = np.random.default_rng(6)
    q_true = jnp.asarray(_rand_q(topo, params, rng, scale=0.2))
    kp = core_pg.fk(params, q_true).site_xpos[:3].reshape(-1)
    nq = topo.nq
    res = core.q_opt(
        params,
        kp,
        jnp.ones(nq, bool),
        jnp.ones(kp.shape[0], kp.dtype),
        params.qpos0,
        -jnp.full(nq, jnp.inf),
        jnp.full(nq, jnp.inf),
    )
    assert float(res.value) < 1e-6


def test_solve_batch_early_exit(free_chain):
    """Flat-LM early exit (stall_iters): converged lanes freeze and the
    while_loop exits once ALL lanes stall — at unchanged solution quality
    vs the fixed-iteration schedule, and with per-lane results independent
    of batch composition (the bitwise chunked==single guarantee)."""
    topo, params, core, _ = free_chain
    rng = np.random.default_rng(9)
    nq = topo.nq
    F = 5
    q_true = np.stack([_rand_q(topo, params, rng, 0.2) for _ in range(F)])
    kp = jax.vmap(lambda q: core.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true, jnp.float32)
    )
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    q0 = jnp.broadcast_to(params.qpos0, (F, nq))
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)
    qs_all = jnp.ones(nq, bool)

    gn_ee = GNIK(topo, np.arange(3), maxiter=40, tol=1e-12,
                 linesearch=False, stall_iters=3)
    gn_fix = GNIK(topo, np.arange(3), maxiter=40, tol=1e-12,
                  linesearch=False, stall_iters=0)

    ee = gn_ee.solve_batch(params, kp, qs_all, kmask, q0, lb, ub)
    fix = gn_fix.solve_batch(params, kp, qs_all, kmask, q0, lb, ub)
    # quality unchanged: both converge to the same marker residual
    np.testing.assert_allclose(
        np.asarray(ee.error), np.asarray(fix.error), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ee.params), np.asarray(fix.params), atol=1e-4
    )
    # and it actually exits early on this easy recovery problem
    assert int(np.asarray(ee.iters)[0]) < 40, np.asarray(ee.iters)
    assert int(np.asarray(fix.iters)[0]) == 40

    # batch-composition independence: lane B solved alone == lane B in a
    # batch with other lanes (bitwise), with early exit active
    solo = gn_ee.solve_batch(
        params, kp[2:3], qs_all, kmask, q0[2:3], lb, ub
    )
    np.testing.assert_array_equal(
        np.asarray(ee.params[2]), np.asarray(solo.params[0])
    )

    # already-at-optimum batch stalls immediately (exit after stall_iters)
    at_opt = gn_ee.solve_batch(
        params, kp, qs_all, kmask, jnp.asarray(ee.params), lb, ub
    )
    assert int(np.asarray(at_opt.iters)[0]) <= 6, np.asarray(at_opt.iters)


def test_solve_batch_nielsen_damping_recovers_pose(free_chain):
    """damping_rule="nielsen" (gain-ratio lambda schedule) meets the same
    recovery contract as the fixed inc/dec rule on an easy batch, and the
    two rules agree to solver tolerance (not bitwise: different lambda
    trajectories)."""
    topo, params, core, _ = free_chain
    rng = np.random.default_rng(11)
    nq = topo.nq
    F = 4
    q_true = np.stack([_rand_q(topo, params, rng, 0.2) for _ in range(F)])
    kp = jax.vmap(lambda q: core.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true, jnp.float32)
    )
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    q0 = jnp.broadcast_to(params.qpos0, (F, nq))
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)
    qs_all = jnp.ones(nq, bool)

    nie = GNIK(topo, np.arange(3), maxiter=25, tol=1e-12,
               linesearch=False, stall_iters=0, damping_rule="nielsen")
    fix = GNIK(topo, np.arange(3), maxiter=25, tol=1e-12,
               linesearch=False, stall_iters=0, damping_rule="fixed")
    rn = nie.solve_batch(params, kp, qs_all, kmask, q0, lb, ub)
    rf = fix.solve_batch(params, kp, qs_all, kmask, q0, lb, ub)
    # both drive the marker residual to ~zero on this recoverable problem
    assert float(jnp.max(rn.error)) < 1e-4
    assert float(jnp.max(rf.error)) < 1e-4


def test_nielsen_rho_matches_textbook_gain_ratio(free_chain):
    """The implemented gain ratio IS the Madsen-Nielsen-Tingleff rho.

    The solver's loss carry is f = e'e (2x the textbook F = 1/2 e'e) and
    its predicted reduction drops the textbook 1/2 — the factors cancel,
    so rho is exactly the textbook ratio (see the scaling note in
    gn_ik.solve_batch). This test discriminates that from the
    halved-rho reading: one accepted LM step with rho_textbook ~ 1 must
    shrink lam by the clamped factor 1/3 (shrink(rho~1) = 1/3), whereas a
    half-valued rho (~0.5) would give shrink = 1 - (2*0.5-1)^3 = 1.0 —
    3x apart, far outside f32 noise.
    """
    topo, params, core, gn = free_chain
    rng = np.random.default_rng(7)
    nq = topo.nq
    F = 4
    lam0 = 1e-2
    q_true = np.stack([_rand_q(topo, params, rng, 0.15) for _ in range(F)])
    kp = jax.vmap(lambda q: core.fk(params, q).site_xpos[:3].reshape(-1))(
        jnp.asarray(q_true, jnp.float32)
    )
    kmask = jnp.ones(kp.shape[1], kp.dtype)
    q0 = jnp.broadcast_to(params.qpos0, (F, nq))
    lb = -jnp.full(nq, jnp.inf)
    ub = jnp.full(nq, jnp.inf)
    qs_all = jnp.ones(nq, bool)

    one = GNIK(topo, np.arange(3), maxiter=1, tol=1e-12, linesearch=False,
               stall_iters=0, damping_rule="nielsen", damping_init=lam0)
    res = one.solve_batch(params, kp, qs_all, kmask, q0, lb, ub)
    lam_solver = 1.0 / np.asarray(res.stepsize, np.float64) - 1.0

    # Replicate the single step manually and compute the TEXTBOOK rho
    # (F = 1/2 e'e, pred = 1/2 delta.(lam*delta - g)) in float64.
    fk_b = jax.vmap(one.fk, in_axes=(None, 0))
    fk0 = fk_b(params, q0)
    p0 = np.asarray(fk0.site_xpos[:, one.site_idxs].reshape(F, -1), np.float64)
    e0 = p0 - np.asarray(kp, np.float64)
    J = np.asarray(jax.vmap(one.jacobian)(fk0), np.float64)
    A = np.einsum("frd,fre->fde", J, J)
    g = np.einsum("frd,fr->fd", J, e0)
    delta = -np.linalg.solve(
        A + lam0 * np.eye(one.nv)[None], g[:, :, None]
    )[:, :, 0]
    q_new = jax.vmap(one.retract)(q0, jnp.asarray(delta, jnp.float32))
    p_new = np.asarray(
        fk_b(params, q_new).site_xpos[:, one.site_idxs].reshape(F, -1),
        np.float64,
    )
    e_new = p_new - np.asarray(kp, np.float64)
    F0 = 0.5 * np.sum(e0 * e0, axis=-1)
    F1 = 0.5 * np.sum(e_new * e_new, axis=-1)
    pred_tb = 0.5 * np.sum(delta * (lam0 * delta - g), axis=-1)
    rho_tb = (F0 - F1) / pred_tb
    assert np.all(F1 < F0), "test premise: first step accepted on all lanes"
    # Premise for the discrimination below: textbook rho lands in the
    # shrink clamp (>= ~0.8) while rho/2 lands in the smooth branch.
    assert np.all(rho_tb > 0.8) and np.all(rho_tb < 1.6), rho_tb

    def lam_after(rho):
        shrink = np.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        return np.clip(lam0 * shrink, 1e-7, 1e8)

    np.testing.assert_allclose(lam_solver, lam_after(rho_tb), rtol=1e-3)
    # The halved-rho hypothesis predicts a lam at least ~2.9x larger.
    assert np.all(lam_after(rho_tb / 2) > 2.5 * lam_solver)
