"""SPD solve kernel tests: the Pallas batched Cholesky vs scipy/XLA.

Run in interpret mode on the CPU test mesh; the same kernel code path runs
compiled on TPU (where it replaces XLA's sequential batched cho_factor —
~10x on the LM inner step, see ops/spd.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_mjx_tpu.ops.spd import make_spd_solve, spd_solve_pallas, spd_solve_xla


def _spd_batch(F, n, seed=0, cond=None):
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(F, 3 * n, n)).astype(np.float32)
    A = np.einsum("frd,fre->fde", J, J) + 1e-4 * np.eye(n, dtype=np.float32)
    g = rng.normal(size=(F, n)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(g)


@pytest.mark.parametrize("F,n", [(4, 8), (7, 73), (128, 16)])
def test_pallas_matches_xla(F, n):
    A, g = _spd_batch(F, n)
    x_ref = spd_solve_xla(A, g)
    x = spd_solve_pallas(A, g, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-5)


def test_pallas_residual_small():
    A, g = _spd_batch(5, 24, seed=3)
    x = spd_solve_pallas(A, g, interpret=True)
    r = jnp.einsum("fde,fe->fd", A, x) - g
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(g))
    assert rel < 1e-3


def test_masked_dof_columns_stay_solvable():
    """Damped-identity rows (masked dofs, as the LM step produces) solve fine."""
    A, g = _spd_batch(3, 12, seed=1)
    A = np.array(A)
    # zero out dof columns/rows 4..7 and re-damp the diagonal, like a masked J
    A[:, 4:8, :] = 0.0
    A[:, :, 4:8] = 0.0
    for i in range(4, 8):
        A[:, i, i] = 1e-4
    A = jnp.asarray(A)
    x = spd_solve_pallas(A, g, interpret=True)
    x_ref = spd_solve_xla(A, g)
    assert bool(jnp.isfinite(x).all())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=1e-4)


def test_lane_padding():
    """F not a multiple of the 128-lane tile pads with identity systems."""
    A, g = _spd_batch(130, 8, seed=2)
    x = spd_solve_pallas(A, g, interpret=True)
    x_ref = spd_solve_xla(A, g)
    assert x.shape == (130, 8)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-5)


def test_lanes_lam_operand_matches_explicit_add():
    """Per-frame damping passed as a kernel operand == adding lam*I to A.

    The LM solver passes lam into the kernel (diagonal add on the VMEM-
    resident block) instead of materializing A + lam*I in XLA — a full HBM
    read+write of the (F, n, n) tensor per iteration (ops/spd.py)."""
    from stac_mjx_tpu.ops.spd import (
        _spd_solve_xla_lanes,
        spd_solve_pallas_lanes,
    )

    rng = np.random.default_rng(7)
    F, n = 135, 19  # exercises lane padding too
    A, g = _spd_batch(F, n, seed=7)
    lam = jnp.asarray(np.abs(rng.normal(size=(F,))).astype(np.float32))
    A_l = jnp.transpose(A, (1, 2, 0))
    g_l = jnp.transpose(g, (1, 0))
    x = spd_solve_pallas_lanes(A_l, g_l, lam, interpret=True)
    x_explicit = spd_solve_pallas_lanes(
        A_l + lam[None, None, :] * jnp.eye(n, dtype=A.dtype)[:, :, None],
        g_l,
        interpret=True,
    )
    x_xla = _spd_solve_xla_lanes(A_l, g_l, lam)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_explicit), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_xla), rtol=2e-3, atol=1e-4
    )


def test_make_spd_solve_dispatch():
    assert make_spd_solve("xla") is spd_solve_xla
    with pytest.raises(ValueError):
        make_spd_solve("nonsense")
    # auto on CPU test backend -> xla
    assert make_spd_solve("auto") is spd_solve_xla


def test_solve_batch_matches_vmapped_solve():
    """GNIK.solve_batch == vmap(GNIK.solve) on the synth model (same math)."""
    import mujoco

    from stac_mjx_tpu.models.builder import extract_model
    from stac_mjx_tpu.ops.gn_ik import GNIK

    xml = """
    <mujoco>
      <worldbody>
        <body name="b1"><joint type="hinge" axis="0 0 1" range="-1 1"/>
          <geom type="capsule" size=".01" fromto="0 0 0 .1 0 0"/>
          <site name="s1" pos=".1 0 0"/>
          <body name="b2" pos=".1 0 0"><joint type="hinge" axis="0 1 0" range="-1 1"/>
            <geom type="capsule" size=".01" fromto="0 0 0 .1 0 0"/>
            <site name="s2" pos=".1 0 0"/>
          </body>
        </body>
      </worldbody>
    </mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    topo, params = extract_model(m)
    site_idxs = np.array([0, 1])
    gn = GNIK(topo, site_idxs, maxiter=8, linesearch=False, spd_impl="xla")

    F = 6
    rng = np.random.default_rng(0)
    q_true = jnp.asarray(rng.uniform(-0.8, 0.8, (F, 2)), jnp.float32)
    kp = jax.vmap(lambda q: gn.fk(params, q).site_xpos[site_idxs].reshape(-1))(
        q_true
    )
    q0 = jnp.zeros((F, 2), jnp.float32)
    lb = jnp.full((2,), -1.0)
    ub = jnp.full((2,), 1.0)
    ones_q = jnp.ones(2, bool)
    ones_k = jnp.ones(6, jnp.float32)

    rb = gn.solve_batch(params, kp, ones_q, ones_k, q0, lb, ub)
    rv = jax.vmap(
        lambda kk, qq: gn.solve(params, kk, ones_q, ones_k, qq, lb, ub)
    )(kp, q0)
    np.testing.assert_allclose(
        np.asarray(rb.params), np.asarray(rv.params), rtol=1e-5, atol=1e-6
    )
    # and it actually solved the IK
    np.testing.assert_allclose(
        np.asarray(rb.params), np.asarray(q_true), atol=1e-3
    )
