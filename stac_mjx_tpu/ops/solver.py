"""Box-constrained solvers for the q-phase, written for XLA.

Replaces the reference's jaxopt dependency (`ProjectedGradient` +
`projection_box`, stac_mjx/stac_core.py:10-11,189-190) with a first-party
FISTA projected-gradient implemented as a `lax.while_loop`:

- fully jit/vmap/shard_map-compatible (no Python control flow, static shapes);
- accelerated (FISTA momentum) with Beck–Teboulle backtracking line search;
- stopping rule: fixed-point residual ||x_{k+1} - y_k|| / stepsize <= tol,
  like jaxopt's ProximalGradient error.

Under `jax.vmap` the while_loop runs lockstep across the batch until every
lane converges — exactly what we want for whole-recording batched IK.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PGResult(NamedTuple):
    """Solution of one projected-gradient solve."""

    params: jnp.ndarray  # final iterate (full q vector, box-projected)
    error: jnp.ndarray  # scalar fixed-point residual at exit
    value: jnp.ndarray  # loss at final iterate
    iters: jnp.ndarray  # outer iterations used
    stepsize: jnp.ndarray  # final stepsize


def project_box(x: jnp.ndarray, lb: jnp.ndarray, ub: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection onto [lb, ub] (jaxopt projection_box semantics)."""
    return jnp.clip(x, lb, ub)


@dataclasses.dataclass(frozen=True)
class ProjectedGradient:
    """FISTA projected gradient with backtracking line search.

    Args:
        maxiter: outer iteration cap (reference N_ITER_Q, default 400).
        tol: stop when the fixed-point residual falls below this (FTOL).
        maxls: max backtracking steps per iteration.
        decrease_factor: stepsize shrink per backtracking step.
        init_stepsize: starting stepsize (carried across iterations,
            monotonically non-increasing like jaxopt's linesearch variant).
        acceleration: FISTA momentum on/off.
    """

    maxiter: int = 400
    tol: float = 1e-5
    maxls: int = 15
    decrease_factor: float = 0.5
    init_stepsize: float = 1.0
    acceleration: bool = True

    def run(
        self,
        fun: Callable[[jnp.ndarray], jnp.ndarray],
        x0: jnp.ndarray,
        lb: jnp.ndarray,
        ub: jnp.ndarray,
    ) -> PGResult:
        """Minimize ``fun`` over the box [lb, ub] starting from x0.

        ``fun`` must be a scalar loss of the full parameter vector; it is
        differentiated with plain autodiff (``jax.value_and_grad``).
        """
        value_and_grad = jax.value_and_grad(fun)
        dtype = x0.dtype
        maxiter = self.maxiter

        def linesearch(y, f_y, g_y, stepsize):
            """Backtracking: find stepsize s.t. sufficient decrease holds."""

            # Rounding slack: near the optimum f_next and the quadratic bound
            # agree to within float eps; without slack the test rejects good
            # steps ~50% of the time in f32 and the stepsize random-walks down.
            eps = jnp.asarray(
                2.0 * jnp.finfo(dtype).eps, dtype
            ) * (1.0 + jnp.abs(f_y))

            def make_step(ss):
                x_next = project_box(y - ss * g_y, lb, ub)
                diff = x_next - y
                f_next = fun(x_next)
                # Beck–Teboulle condition: F(x+) <= F(y) + <g, d> + ||d||^2/(2t)
                q_bound = f_y + jnp.vdot(g_y, diff) + jnp.vdot(diff, diff) / (
                    2.0 * ss
                )
                return x_next, f_next, q_bound + eps

            def cond(state):
                ls_iter, ss, x_next, f_next, ok = state
                return jnp.logical_and(~ok, ls_iter < self.maxls)

            def body(state):
                ls_iter, ss, _, _, _ = state
                ss = jnp.where(ls_iter > 0, ss * self.decrease_factor, ss)
                x_next, f_next, q_bound = make_step(ss)
                ok = f_next <= q_bound
                return (ls_iter + 1, ss, x_next, f_next, ok)

            x_init, f_init, qb = make_step(stepsize)
            state = (
                jnp.asarray(1, jnp.int32),
                stepsize,
                x_init,
                f_init,
                f_init <= qb,
            )
            _, ss, x_next, f_next, _ = jax.lax.while_loop(cond, body, state)
            return x_next, f_next, ss

        def cond(state):
            k, x, y, t, stepsize, err, f_x = state
            return jnp.logical_and(k < maxiter, err > self.tol)

        def body(state):
            k, x, y, t, stepsize, err, f_x = state
            f_y, g_y = value_and_grad(y)
            # Allow the stepsize to recover by one notch per outer iteration;
            # a monotone-shrinking stepsize collapses to the f32 floor where
            # x_next == y and the fixed-point residual reads as converged.
            trial = jnp.minimum(
                stepsize / self.decrease_factor, self.init_stepsize
            )
            x_next, f_next, ss = linesearch(y, f_y, g_y, trial)
            err_next = jnp.linalg.norm((x_next - y).ravel()) / ss
            if self.acceleration:
                t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                y_next = x_next + ((t - 1.0) / t_next) * (x_next - x)
                # Adaptive restart (O'Donoghue & Candes gradient scheme):
                # when momentum points against the descent direction, clear it.
                restart = jnp.vdot(y - x_next, x_next - x) > 0
                t_next = jnp.where(restart, 1.0, t_next)
                y_next = jnp.where(restart, x_next, y_next)
            else:
                t_next = t
                y_next = x_next
            return (k + 1, x_next, y_next, t_next, ss, err_next, f_next)

        f0 = fun(x0)
        init = (
            jnp.asarray(0, jnp.int32),
            x0,
            x0,
            jnp.asarray(1.0, dtype),
            jnp.asarray(self.init_stepsize, dtype),
            jnp.asarray(jnp.inf, dtype),
            f0,
        )
        k, x, y, t, stepsize, err, f_x = jax.lax.while_loop(cond, body, init)
        return PGResult(params=x, error=err, value=f_x, iters=k, stepsize=stepsize)


class MOptResult(NamedTuple):
    """Result of the closed-form marker-offset solve."""

    params: jnp.ndarray  # (K, 3) optimal offsets
    error: jnp.ndarray  # scalar residual at the solution


def m_opt_closed_form(
    p_all: jnp.ndarray,
    R_all: jnp.ndarray,
    y: jnp.ndarray,
    initial_offsets: jnp.ndarray,
    is_regularized: jnp.ndarray,
    reg_coef,
    n_frames_total=None,
    axis_name: str | None = None,
) -> MOptResult:
    """Exact coordinate-wise solve of the marker-offset quadratic.

    Same closed form as the reference (stac_mjx/stac_core.py:102-172):

        min_m  sum_t || y_t - (p_t + R_t m) ||^2 + reg * || D (m - m0) ||^2
        m* = (sum_t R_t^T (y_t - p_t) + reg * d * m0) / (T + reg * d)

    assuming identity site_quat (as the reference does; documented at
    stac_mjx/stac_core.py:120-126). The frame sums are associative, so when
    frames are sharded across devices pass ``axis_name`` and the partial
    statistics reduce with a single psum — this is the distributed m-phase
    described in SURVEY.md §5.8.

    Args:
        p_all: (T, K, 3) body positions per sampled frame per site.
        R_all: (T, K, 3, 3) body rotations.
        y: (T, K, 3) observed keypoints.
        initial_offsets: (K, 3) reference offsets m0.
        is_regularized: (K, 3) 0/1 mask D.
        reg_coef: scalar regularization coefficient.
        n_frames_total: global frame count T (defaults to local shard count).
        axis_name: mesh axis to psum partial sums over, or None.

    Returns:
        MOptResult with optimal offsets and the residual at the solution.
    """
    dtype = y.dtype
    d = is_regularized.astype(dtype)
    T_local = y.shape[0]

    z_all = y - p_all  # (T, K, 3)
    # s_k = sum_t R_{t,k}^T z_{t,k}
    s = jnp.einsum("tkji,tkj->ki", R_all, z_all)
    z2 = jnp.sum(z_all**2)

    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        z2 = jax.lax.psum(z2, axis_name)
        if n_frames_total is None:
            n_frames_total = T_local * jax.lax.psum(1, axis_name)
    T = jnp.asarray(
        n_frames_total if n_frames_total is not None else T_local, dtype
    )

    denom = T + reg_coef * d
    numer = s + reg_coef * d * initial_offsets
    m_star = numer / denom

    data_term = z2 - 2.0 * jnp.sum(m_star * s) + T * jnp.sum(m_star**2)
    reg_term = reg_coef * jnp.sum((d * (m_star - initial_offsets)) ** 2)
    return MOptResult(params=m_star, error=data_term + reg_term)
