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
    """Solution of one box-constrained pose solve (any q_solver).

    Field semantics are uniform across solvers for ``params``/``value``/
    ``iters``; ``error`` is the solver's NATIVE convergence diagnostic and
    means different things per solver (documented here so no caller ever
    prints it as a physical quantity — user-facing per-frame errors are the
    config-independent marker distances computed in pipeline.py):

    - pg / pg-jaxopt: fixed-point residual ||x_{k+1} - x_k|| / stepsize
      (jaxopt ProximalGradient's error).
    - gn (linesearch Gauss-Newton): accepted-step norm ||dq||.
    - gn-lm (flat Levenberg-Marquardt): sqrt of the final masked SSE loss.

    ``value`` is ALWAYS the masked SSE loss at the final iterate.
    """

    params: jnp.ndarray  # final iterate (full q vector, box-projected)
    error: jnp.ndarray  # solver-native convergence diagnostic (see above)
    value: jnp.ndarray  # masked SSE loss at the final iterate
    iters: jnp.ndarray  # outer iterations used
    stepsize: jnp.ndarray  # final stepsize (gn/gn-lm: 1/(1+lambda))


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
    jaxopt_mode: bool = False
    # Per-deviation overrides (None = follow jaxopt_mode). Each names one
    # way the jaxopt-0.8.5 reconstruction differs from the robust default;
    # tests/test_jaxopt_witness.py flips them one at a time to show every
    # deviation is individually material (self-justifying golden budgets).
    ls_slack: bool | None = None  # eps rounding slack in the decrease test
    reordered_test: bool | None = None  # jaxopt's multiply-through form
    monotone_stepsize: bool | None = None  # shrink-only + underflow reset
    error_from_x: bool | None = None  # error anchored at x_prev (vs y)
    adaptive_restart: bool | None = None  # O'Donoghue–Candès restart

    def _resolved(self):
        """Resolve the five deviation flags against jaxopt_mode defaults."""
        j = self.jaxopt_mode
        pick = lambda v, jaxopt_val: jaxopt_val if v is None else v  # noqa: E731
        return (
            pick(self.ls_slack, not j),
            pick(self.reordered_test, j),
            pick(self.monotone_stepsize, j),
            pick(self.error_from_x, j),
            pick(self.adaptive_restart, not j),
        )

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

        Two iteration policies are provided:

        - default (robust f32 path): an eps rounding slack in the
          sufficient-decrease test, one notch of per-iteration stepsize
          recovery, and O'Donoghue–Candès adaptive restart. These keep the
          linesearch from random-walking to the f32 stepsize floor.
        - ``jaxopt_mode=True`` (reference-parity path): reproduces jaxopt
          0.8.5's ProximalGradient acceleration branch, the solver the
          reference wraps (stac_mjx/stac_core.py:66-99,182-190) — the
          sufficient-decrease test in jaxopt's reordered multiply-through
          form with no slack, a monotone carried stepsize that resets to 1.0
          only when it underflows 1e-6, plain FISTA momentum with no
          restart, and error = ||x_{k+1} - x_k|| / stepsize. jaxopt itself
          is not installable in this build environment (no mjx/jaxopt
          wheels), so this mode is a documented reconstruction of its
          iteration, frozen by the recorded goldens in tests/goldens/.
        """
        value_and_grad = jax.value_and_grad(fun)
        dtype = x0.dtype
        maxiter = self.maxiter
        (
            use_slack,
            reordered_test,
            monotone_stepsize,
            error_from_x,
            restart_on,
        ) = self._resolved()

        def linesearch(y, f_y, g_y, stepsize):
            """Backtrack from ``stepsize`` until sufficient decrease holds."""

            if not use_slack:
                eps = jnp.asarray(0.0, dtype)
            else:
                # Rounding slack: near the optimum f_next and the quadratic
                # bound agree to within float eps; without slack the test
                # rejects good steps ~50% of the time in f32 and the stepsize
                # random-walks down.
                eps = jnp.asarray(2.0 * jnp.finfo(dtype).eps, dtype) * (
                    1.0 + jnp.abs(f_y)
                )

            def make_step(ss):
                x_next = project_box(y - ss * g_y, lb, ub)
                diff = x_next - y
                f_next = fun(x_next)
                if reordered_test:
                    # jaxopt's reordered form: multiply the Beck–Teboulle
                    # bound through by the stepsize so no division appears.
                    lhs = ss * (f_next - f_y)
                    rhs = ss * jnp.vdot(diff, g_y) + 0.5 * jnp.vdot(diff, diff)
                    ok = lhs <= rhs + eps * ss
                else:
                    q_bound = (
                        f_y
                        + jnp.vdot(g_y, diff)
                        + jnp.vdot(diff, diff) / (2.0 * ss)
                    )
                    ok = f_next <= q_bound + eps
                return x_next, f_next, ok

            # Candidate budget: the carried stepsize plus maxls shrinks in
            # jaxopt_mode (jaxopt runs its bounded while_loop maxls times
            # after the initial trial); maxls total candidates otherwise.
            ls_bound = self.maxls + 1 if self.jaxopt_mode else self.maxls

            def cond(state):
                ls_iter, ss, x_next, f_next, ok = state
                return jnp.logical_and(~ok, ls_iter < ls_bound)

            def body(state):
                ls_iter, ss, _, _, _ = state
                ss = jnp.where(ls_iter > 0, ss * self.decrease_factor, ss)
                x_next, f_next, ok = make_step(ss)
                return (ls_iter + 1, ss, x_next, f_next, ok)

            x_init, f_init, ok0 = make_step(stepsize)
            state = (jnp.asarray(1, jnp.int32), stepsize, x_init, f_init, ok0)
            _, ss, x_next, f_next, _ = jax.lax.while_loop(cond, body, state)
            return x_next, f_next, ss

        def cond(state):
            k, x, y, t, stepsize, err, f_x = state
            return jnp.logical_and(k < maxiter, err > self.tol)

        def body(state):
            k, x, y, t, stepsize, err, f_x = state
            f_y, g_y = value_and_grad(y)
            if monotone_stepsize:
                # jaxopt: the stepsize only ever shrinks across iterations,
                # resetting to 1.0 when it underflows 1e-6.
                trial = jnp.where(stepsize <= 1e-6, 1.0, stepsize)
            else:
                # Allow the stepsize to recover by one notch per outer
                # iteration; a monotone-shrinking stepsize collapses to the
                # f32 floor where x_next == y and the fixed-point residual
                # reads as converged.
                trial = jnp.minimum(
                    stepsize / self.decrease_factor, self.init_stepsize
                )
            x_next, f_next, ss = linesearch(y, f_y, g_y, trial)
            if error_from_x:
                err_next = jnp.linalg.norm((x_next - x).ravel()) / ss
            else:
                err_next = jnp.linalg.norm((x_next - y).ravel()) / ss
            # Failure containment: a non-finite step (NaN keypoints, inf
            # loss) keeps the previous iterate and exits — the functional
            # analog of the reference's solver-failure fallback that
            # restores q0 (stac_mjx/stac_core.py:93-99, utils.py:147-169).
            # For finite steps this is the identity, so parity numerics
            # are untouched.
            ok = jnp.isfinite(f_next) & jnp.all(jnp.isfinite(x_next))
            x_next = jnp.where(ok, x_next, x)
            f_next = jnp.where(ok, f_next, f_x)
            err_next = jnp.where(ok, err_next, 0.0)
            if self.acceleration:
                t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                y_next = x_next + ((t - 1.0) / t_next) * (x_next - x)
                if restart_on:
                    # Adaptive restart (O'Donoghue & Candes gradient scheme):
                    # when momentum points against descent, clear it.
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
    """Exact solve of the marker-offset quadratic, coordinate by coordinate.

    The m-phase objective (same as the reference's, stac_mjx/stac_core.py:
    102-172, with site_quat = identity as documented there) is

        J(m) = sum_t || y_t - (p_t + R_t m) ||^2 + reg * || D (m - m0) ||^2.

    Because each R_t is orthonormal, sum_t m^T R_t^T R_t m = T ||m||^2 and J
    decouples per site and per coordinate. Setting dJ/dm = 0 gives, with
    g = sum_t R_t^T (y_t - p_t) the rotated-residual accumulator,

        m_hat = (g + reg * D * m0) / (T + reg * D)     (elementwise).

    Both sufficient statistics (g and the squared-residual total) are plain
    sums over frames, so a frame-sharded mesh computes shard-local partials
    and reduces them with one psum each — pass ``axis_name`` for that
    distributed path (SURVEY.md §5.8); the reference has no such layer.

    Args:
        p_all: (T, K, 3) parent-body world positions per sampled frame.
        R_all: (T, K, 3, 3) parent-body world rotations.
        y: (T, K, 3) observed keypoints.
        initial_offsets: (K, 3) regularization anchor m0.
        is_regularized: (K, 3) 0/1 mask D selecting penalized sites.
        reg_coef: scalar penalty weight.
        n_frames_total: global frame count (defaults to the local count, or
            to the psum'd count when axis_name is given).
        axis_name: mesh axis to reduce the frame statistics over, or None.

    Returns:
        MOptResult with the optimal offsets and J(m_hat).
    """
    dtype = y.dtype
    mask = is_regularized.astype(dtype)
    frames_here = y.shape[0]

    resid = y - p_all  # world-frame marker residual, (T, K, 3)
    g = jnp.einsum("tkji,tkj->ki", R_all, resid)  # body-frame accumulator
    sq_total = jnp.sum(resid * resid)

    if axis_name is not None:
        g = jax.lax.psum(g, axis_name)
        sq_total = jax.lax.psum(sq_total, axis_name)
        if n_frames_total is None:
            n_frames_total = frames_here * jax.lax.psum(1, axis_name)
    n_frames = jnp.asarray(
        frames_here if n_frames_total is None else n_frames_total, dtype
    )

    anchor = reg_coef * mask
    m_hat = (g + anchor * initial_offsets) / (n_frames + anchor)

    # J(m_hat), expanded so it needs only the reduced statistics:
    # sum_t ||r_t - R_t m||^2 = sum ||r||^2 - 2 m.g + T ||m||^2.
    fit_term = sq_total - 2.0 * jnp.sum(m_hat * g) + n_frames * jnp.sum(m_hat * m_hat)
    penalty = reg_coef * jnp.sum((mask * (m_hat - initial_offsets)) ** 2)
    return MOptResult(params=m_hat, error=fit_term + penalty)
