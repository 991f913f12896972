"""Cross-validation of the jaxopt-0.8.5 reconstruction (VERDICT r2 missing #2).

Two independent checks:

1. WITNESS AGREEMENT — ops/solver.ProjectedGradient(jaxopt_mode=True) must
   agree iterate-for-iterate with tests/_jaxopt_numpy.fista_box_numpy, a
   pure-NumPy transcription of jaxopt 0.8.5's ProximalGradient acceleration
   branch that shares no code with the JAX solver. Run in f64 (CPU) so
   agreement is to roundoff, on synthetic problems and on a real rodent
   frame's q_loss.

2. SENSITIVITY — each of the five documented deviations between jaxopt_mode
   and the robust default is individually material: flipping any ONE flag on
   a real rodent parity fit moves fit_qpos beyond the golden budget
   (tests/test_parity.py TOL), making the 1e-5 budgets self-justifying
   (VERDICT r2 weak #6). The exhaustive per-flag fit-level tests are
   compile-bound (~2.5 min each here) and run under STAC_TPU_SLOW; the
   default suite runs a single-solve fast guard for the two deviations
   visible at solve level.
"""

import dataclasses
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stac_mjx_tpu.ops.solver import ProjectedGradient

from _jaxopt_numpy import fista_box_numpy
from conftest import reference_path, x64_mode

GOLDEN_DIR = Path(__file__).parent / "goldens"
CHECK_ITERS = [1, 2, 3, 5, 8, 13, 21, 34]


def _jax_iterate(fun, x0, lb, ub, k, tol=0.0):
    pg = ProjectedGradient(maxiter=k, tol=tol, jaxopt_mode=True)
    run = jax.jit(lambda x, lo, hi: pg.run(fun, x, lo, hi).params)
    return np.asarray(run(x0, lb, ub))


def _assert_trajectories_agree(
    fun_np, grad_np, fun_jax, x0, lb, ub, atol, check_iters=CHECK_ITERS
):
    traj = fista_box_numpy(
        fun_np, grad_np, np.asarray(x0), np.asarray(lb), np.asarray(ub),
        maxiter=max(check_iters), tol=0.0,
    )
    for k in check_iters:
        if k >= len(traj):
            break
        got = _jax_iterate(fun_jax, x0, lb, ub, k)
        np.testing.assert_allclose(
            got, traj[k], atol=atol,
            err_msg=f"iterate {k} diverged between NumPy witness and "
            f"jaxopt_mode solver",
        )


def test_witness_agrees_box_quadratic_f64():
    """Iterate-for-iterate agreement on a box-constrained SPD quadratic."""
    with x64_mode():
        rng = np.random.default_rng(0)
        n = 12
        M = rng.normal(size=(n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.normal(size=n)
        lb = -0.3 * np.ones(n)
        ub = 0.4 * np.ones(n)

        def fun_np(x):
            return 0.5 * x @ A @ x - b @ x

        def grad_np(x):
            return A @ x - b

        A_j, b_j = jnp.asarray(A), jnp.asarray(b)

        def fun_jax(x):
            return 0.5 * x @ A_j @ x - b_j @ x

        x0 = jnp.zeros(n, jnp.float64)
        _assert_trajectories_agree(
            fun_np, grad_np, fun_jax,
            x0, jnp.asarray(lb), jnp.asarray(ub), atol=1e-10,
        )


def test_witness_agrees_rosenbrock_f64():
    """Agreement holds on a nonconvex problem (linesearch exercises shrinks)."""
    with x64_mode():
        n = 6

        def fun_np(x):
            return float(
                np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)
            )

        def grad_np(x):
            g = np.zeros_like(x)
            g[:-1] = -400.0 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2.0 * (
                1.0 - x[:-1]
            )
            g[1:] += 200.0 * (x[1:] - x[:-1] ** 2)
            return g

        def fun_jax(x):
            return jnp.sum(
                100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
            )

        x0 = jnp.zeros(n, jnp.float64)
        lb = -2.0 * jnp.ones(n, jnp.float64)
        ub = 2.0 * jnp.ones(n, jnp.float64)
        _assert_trajectories_agree(
            fun_np, grad_np, fun_jax, x0, lb, ub, atol=1e-9,
        )


def test_witness_agrees_rodent_frame_f64():
    """Agreement on one real rodent frame's q_loss (FK-through objective)."""
    reference_path("tests/data/test_rodent_mocap_1000_frames.nwb")
    from stac_mjx_tpu import io
    from stac_mjx_tpu.config import compose_config
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    cfg = compose_config("configs", overrides=["model=rodent", "stac=demo"])
    cfg.stac.data_path = str(
        resolve_asset("tests/data/test_rodent_mocap_1000_frames.nwb")
    )
    kp, names = io.load_data(cfg, base_path="/root/repo")
    stac = Stac(resolve_asset(cfg.model.MJCF_PATH), cfg, names)
    core = stac.stac_core_obj

    with x64_mode():
        params64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), stac.params
        )
        kp64 = jnp.asarray(np.asarray(kp[0]), jnp.float64)
        q0 = jnp.asarray(np.asarray(stac.params.qpos0), jnp.float64)
        qs_all = jnp.ones_like(q0, bool)
        kps_all = jnp.ones(kp64.shape[0], jnp.float64)
        lb = jnp.asarray(np.asarray(stac._lb), jnp.float64)
        ub = jnp.asarray(np.asarray(stac._ub), jnp.float64)

        def fun_jax(q):
            return core.q_loss(q, params64, kp64, qs_all, kps_all, q0)

        fun_jit = jax.jit(fun_jax)
        grad_jit = jax.jit(jax.grad(fun_jax))
        fun_np = lambda x: float(fun_jit(jnp.asarray(x)))  # noqa: E731
        grad_np = lambda x: np.asarray(grad_jit(jnp.asarray(x)))  # noqa: E731

        # The witness validates the ITERATION; the objective oracle (FK) is
        # shared — it is golden-tested against MuJoCo C separately. Fewer
        # checkpoints than the synthetic problems: each k is a fresh x64
        # compile of the full FK-through while_loop.
        _assert_trajectories_agree(
            fun_np, grad_np, fun_jax, q0, lb, ub, atol=1e-9,
            check_iters=[2, 9, 27],
        )


# ------------------------------------------------------- budget sensitivity


FLAG_FLIPS = [
    ("ls_slack", True),
    ("reordered_test", False),
    ("monotone_stepsize", False),
    ("error_from_x", False),
    ("adaptive_restart", True),
]


def _sensitivity_fit_qpos(flag=None, value=None):
    """A slimmed rodent parity fit (2 frames, 1 alternation, no part passes
    — solver-deviation sensitivity doesn't need them) through the same
    pg-jaxopt sequential path the goldens pin."""
    from tests.goldens import workloads

    cfg, kp, stac = workloads._setup(
        [
            "model=rodent",
            "stac=demo",
            "stac.n_fit_frames=2",
            "model.N_ITERS=1",
            "model.N_ITER_Q=100",
            "stac.n_frames_per_clip=2",
            "stac.skip_part_opt=true",
        ]
    )
    if stac is None:
        pytest.skip("reference data asset unavailable")
    if flag is not None:
        stac.stac_core_obj.solver = dataclasses.replace(
            stac.stac_core_obj.solver, **{flag: value}
        )
    fit = stac.fit_offsets(kp[: int(cfg.stac.n_fit_frames)])
    return np.asarray(fit.qpos)


def test_solve_level_sensitivity_fast():
    """Default-suite guard: the stepsize policy and restart deviations are
    material on a SINGLE real rodent solve (the per-flag fit-level tests
    below are exhaustive but compile-bound — ~2.5 min each on this 2-core
    box — so they run under STAC_TPU_SLOW; the slack/decrease-test/error
    deviations only compound to visibility through the fit's warm-start +
    m-phase feedback)."""
    from tests.goldens import workloads

    cfg, kp, stac = workloads._setup(["model=rodent", "stac=demo"])
    if stac is None:
        pytest.skip("reference data asset unavailable")
    core = stac.stac_core_obj
    q0 = stac.params.qpos0
    qs_all = jnp.ones_like(q0, bool)
    kps_all = jnp.ones(kp.shape[1], jnp.float32)
    kp0 = jnp.asarray(kp[0], jnp.float32)

    def solve(solver):
        fn = jax.jit(
            lambda: solver.run(
                lambda q: core.q_loss(
                    q, stac.params, kp0, qs_all, kps_all, q0
                ),
                q0,
                stac._lb,
                stac._ub,
            ).params
        )
        return np.asarray(fn())

    base = solve(core.solver)
    for flag, value in [("monotone_stepsize", False), ("adaptive_restart", True)]:
        q = solve(dataclasses.replace(core.solver, **{flag: value}))
        delta = float(np.max(np.abs(q - base)))
        assert delta > 1e-3, (flag, delta)


@pytest.fixture(scope="module")
def sensitivity_baseline():
    return _sensitivity_fit_qpos()


@pytest.mark.skipif(
    not os.environ.get("STAC_TPU_SLOW"),
    reason="each flip recompiles the full parity fit (~2.5 min on this box);"
    " set STAC_TPU_SLOW=1",
)
@pytest.mark.parametrize("flag,value", FLAG_FLIPS)
def test_golden_budget_sensitivity(flag, value, sensitivity_baseline):
    """Flipping any single jaxopt_mode deviation moves a real rodent parity
    fit's qpos beyond the golden budget (tests/test_parity.py TOL) — the
    1e-5 budgets therefore detect every individual deviation."""
    from tests.test_parity import TOL

    qpos = _sensitivity_fit_qpos(flag, value)
    delta = float(np.max(np.abs(qpos - sensitivity_baseline)))
    assert delta > TOL["fit_qpos"], (
        f"flipping {flag}={value} moved fit_qpos by only {delta:.3e} "
        f"(budget {TOL['fit_qpos']:.1e}) — deviation is not material; "
        f"either remove it from the reconstruction or tighten the docs"
    )
