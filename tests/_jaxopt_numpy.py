"""Standalone NumPy transcription of jaxopt 0.8.5 ProximalGradient (FISTA).

Independent witness for the pg-jaxopt reconstruction in
stac_mjx_tpu/ops/solver.py (VERDICT r2 missing #2): jaxopt itself has no
wheels in this environment, so this module re-derives the acceleration
branch of jaxopt 0.8.5's ``ProximalGradient`` — Beck–Teboulle FISTA with
backtracking line search (Beck & Teboulle 2009, SIAM J. Imaging Sci. 2(1)),
with jaxopt's specific conventions:

- prox = box projection (``ProjectedGradient`` = ``ProximalGradient`` with
  ``projection_box``; the stepsize scaling is ignored by projections),
- the gradient step is taken from the momentum point ``y``,
- sufficient decrease is tested in jaxopt's reordered multiply-through form
  ``ss*(f(x+) - f(y)) <= ss*<x+ - y, g(y)> + 0.5*||x+ - y||^2`` with NO
  rounding slack,
- the line search makes one trial at the carried stepsize then at most
  ``maxls`` shrink-trials, exiting with the last candidate even on failure,
- the carried stepsize only ever shrinks across outer iterations, resetting
  to 1.0 when it underflows 1e-6,
- plain FISTA momentum ``t_{k+1} = (1 + sqrt(1 + 4 t_k^2))/2``,
  ``y_{k+1} = x_{k+1} + ((t_k - 1)/t_{k+1}) (x_{k+1} - x_k)`` with no
  restart,
- error = ||x_{k+1} - x_k|| / stepsize, stop when error <= tol,
  first iteration always runs (error starts at +inf).

NO JAX imports: pure NumPy, written against the published algorithm — the
agreement test (tests/test_jaxopt_witness.py) is only meaningful because
this file shares no code with ops/solver.py.
"""

from __future__ import annotations

import numpy as np


def fista_box_numpy(
    fun,
    grad,
    x0: np.ndarray,
    lb: np.ndarray,
    ub: np.ndarray,
    maxiter: int = 400,
    tol: float = 1e-5,
    maxls: int = 15,
    decrease_factor: float = 0.5,
    init_stepsize: float = 1.0,
):
    """Run the FISTA iteration; return the trajectory [x0, x1, ..., xK].

    ``fun``/``grad`` are scalar-loss / gradient callables on the full
    vector (any dtype; all solver arithmetic follows x0.dtype).
    """
    dtype = x0.dtype
    x = np.array(x0, dtype=dtype)
    y = x.copy()
    t = dtype.type(1.0)
    stepsize = dtype.type(init_stepsize)
    err = np.inf
    traj = [x.copy()]

    for _ in range(maxiter):
        if not err > tol:
            break
        f_y = fun(y)
        g_y = grad(y)

        # Carried-stepsize reset (jaxopt: shrink-only across iterations,
        # reset to 1.0 on underflow below 1e-6).
        ss = dtype.type(1.0) if stepsize <= 1e-6 else stepsize

        # One trial at ss, then at most maxls shrink-trials; exit with the
        # last candidate even if the decrease test never passed.
        for ls in range(maxls + 1):
            x_next = np.clip(y - ss * g_y, lb, ub)
            diff = x_next - y
            f_next = fun(x_next)
            lhs = ss * (f_next - f_y)
            rhs = ss * np.vdot(diff, g_y) + dtype.type(0.5) * np.vdot(diff, diff)
            if lhs <= rhs:
                break
            if ls < maxls:
                ss = ss * dtype.type(decrease_factor)

        err = float(np.linalg.norm((x_next - x).ravel()) / ss)
        t_next = dtype.type(0.5) * (dtype.type(1.0) + np.sqrt(dtype.type(1.0) + dtype.type(4.0) * t * t))
        y = x_next + ((t - dtype.type(1.0)) / t_next) * (x_next - x)
        x = x_next
        t = t_next
        stepsize = ss
        traj.append(np.array(x))

    return traj
