"""STAC solver core: q-phase loss/solve and m-phase closed form over our FK.

TPU-native replacement for the reference's `stac_mjx/stac_core.py`: the same
objective and masks (q_loss at stac_core.py:27-63, closed-form _m_opt at
stac_core.py:102-172) but evaluated through the first-party FK core instead of
MJX, with the solver from `stac_mjx_tpu.ops.solver` instead of jaxopt. Every
method is pure and jit/vmap-safe; the pipeline composes them under a single
jit (no per-frame Python dispatch like compute_stac.py:256-267).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stac_mjx_tpu.models.kinematics import (
    KinParams,
    KinTopology,
    make_fk,
    make_fk_jump,
)
from stac_mjx_tpu.ops.gn_ik import GNIK
from stac_mjx_tpu.ops.solver import (
    MOptResult,
    PGResult,
    ProjectedGradient,
    m_opt_closed_form,
)


def make_qs(q0: jnp.ndarray, qs_to_opt: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Combine initial and optimized joint angles by mask.

    Parity with the reference's `make_qs` (stac_mjx/utils.py:129-144).
    """
    return jnp.where(qs_to_opt, q, q0)


class StacCore:
    """Pose (projected-gradient) and offset (closed-form) optimization core.

    One instance per kinematic topology; all returned callables close over the
    static tree structure so jit sees only array arguments.
    """

    def __init__(
        self,
        topo: KinTopology,
        site_idxs: np.ndarray,
        tol: float = 1e-5,
        n_iter_q: int = 400,
        q_solver: str = "pg",
        fk_impl: str = "scan",
        spd_impl: str = "auto",
        gn_stall_iters: int = 0,
        gn_damping_rule: str = "nielsen",
        gn_iters: int = 0,
    ):
        """q_solver: "pg" (projected gradient, robust f32 defaults),
        "pg-jaxopt" (projected gradient locked to jaxopt 0.8.5
        ProximalGradient iteration semantics — the reference-parity
        numerics; see ops/solver.py), "gn"
        (damped Gauss-Newton with backtracking linesearch, ~30x fewer
        sequential iterations), or "gn-lm" (flat Levenberg-Marquardt: fixed
        iteration count, no nested loop — best lockstep throughput).
        fk_impl: "scan" (level scan, O(depth) steps) or "jump"
        (pointer doubling, O(log depth) steps — the TPU throughput FK).
        spd_impl: normal-equation solve backend for the GN solvers —
        "auto" (Pallas kernel on TPU, XLA elsewhere), "pallas",
        "pallas-interpret", or "xla" (see stac_mjx_tpu/ops/spd.py).
        gn_stall_iters: flat-LM early exit; default 0 (off), matching
        StacConfig.gn_stall_iters — measured a strict loss on the
        flagship lockstep workloads (see config.py for the numbers)."""
        self.topo = topo
        self.site_idxs = np.asarray(site_idxs)
        self.site_body = topo.site_bodyid[self.site_idxs]
        make = make_fk_jump if fk_impl == "jump" else make_fk
        self.fk = make(topo)
        self.q_solver_kind = "gn" if q_solver.startswith("gn") else q_solver
        self.solver = ProjectedGradient(
            maxiter=n_iter_q, tol=tol, jaxopt_mode=(q_solver == "pg-jaxopt")
        )
        if q_solver.startswith("gn"):
            # gn_iters=0 -> auto: 14 iterations for the flat LM under the
            # nielsen damping rule (the measured quality/throughput knee
            # on v5e — see config.py StacConfig.gn_iters); 16 otherwise
            # (the damping rule only drives the flat solve_batch path —
            # the linesearch "gn" solver keeps its own schedule).
            auto_iters = (
                14
                if (q_solver == "gn-lm" and gn_damping_rule == "nielsen")
                else 16
            )
            self.gnik = GNIK(
                topo,
                self.site_idxs,
                maxiter=(
                    gn_iters if gn_iters > 0 else min(n_iter_q, auto_iters)
                ),
                tol=tol * tol,
                fk_impl=fk_impl,
                linesearch=(q_solver != "gn-lm"),
                spd_impl=spd_impl,
                stall_iters=gn_stall_iters,
                damping_rule=gn_damping_rule,
            )

    # ------------------------------------------------------------------ q

    def q_loss(
        self,
        q: jnp.ndarray,
        params: KinParams,
        kp_data: jnp.ndarray,
        qs_to_opt: jnp.ndarray,
        kps_to_opt: jnp.ndarray,
        initial_q: jnp.ndarray,
    ) -> jnp.ndarray:
        """Masked SSE between observed keypoints and FK'd marker sites.

        Same objective as the reference q_loss (stac_mjx/stac_core.py:27-63):
        masked scatter of q into qpos, FK, gather site positions, masked sum
        of squared residuals.
        """
        qpos = make_qs(initial_q, qs_to_opt, q)
        res = self.fk(params, qpos)
        markers = res.site_xpos[self.site_idxs].reshape(-1)
        residual = (kp_data - markers) * kps_to_opt
        return jnp.sum(jnp.square(residual))

    def q_opt(
        self,
        params: KinParams,
        kp_data: jnp.ndarray,
        qs_to_opt: jnp.ndarray,
        kps_to_opt: jnp.ndarray,
        q0: jnp.ndarray,
        lb: jnp.ndarray,
        ub: jnp.ndarray,
    ) -> PGResult:
        """One box-constrained pose solve for a single frame.

        Returns the full-length q vector; callers re-combine with
        ``make_qs(q0, qs_to_opt, result.params)`` exactly like the reference
        (compute_stac.py:76-98,231-250), so masked-out entries keep q0.
        """

        if self.q_solver_kind == "gn":
            return self.gnik.solve(
                params, kp_data, qs_to_opt, kps_to_opt, q0, lb, ub
            )

        def fun(q):
            return self.q_loss(q, params, kp_data, qs_to_opt, kps_to_opt, q0)

        return self.solver.run(fun, q0, lb, ub)

    def q_opt_batch(
        self,
        params: KinParams,
        kp_data: jnp.ndarray,
        qs_to_opt: jnp.ndarray,
        kps_to_opt: jnp.ndarray,
        q0: jnp.ndarray,
        lb: jnp.ndarray,
        ub: jnp.ndarray,
        maxiter: int | None = None,
    ) -> PGResult:
        """Pose solves over a whole frame batch: kp_data/q0 are (F, ·).

        With the flat-LM solver ("gn-lm") this runs the natively-batched
        flat LM (the Pallas SPD kernel solves all frames' normal equations
        in one sweep); the linesearch GN ("gn") and projected-gradient
        solvers keep their own per-frame semantics under vmap.

        ``qs_to_opt`` is (nq,) — one mask shared by every frame, like the
        lockstep scheduler's full-q pass — or (F, nq) per item, which is how
        the batched part-opt mode runs every part's refinement in one sweep
        (pipeline.pose_optimization, part_opt_mode="batched").
        """
        if self.q_solver_kind == "gn" and not self.gnik.linesearch:
            return self.gnik.solve_batch(
                params, kp_data, qs_to_opt, kps_to_opt, q0, lb, ub,
                maxiter=maxiter,
            )
        if qs_to_opt.ndim == 2:
            return jax.vmap(
                lambda kp_t, q0_t, qs_t: self.q_opt(
                    params, kp_t, qs_t, kps_to_opt, q0_t, lb, ub
                )
            )(kp_data, q0, qs_to_opt)
        return jax.vmap(
            lambda kp_t, q0_t: self.q_opt(
                params, kp_t, qs_to_opt, kps_to_opt, q0_t, lb, ub
            )
        )(kp_data, q0)

    # ------------------------------------------------------------------ m

    def site_frames(
        self, params: KinParams, q: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Body positions/rotations for each keypoint site over frames.

        q: (T, nq) -> p_all (T, K, 3), R_all (T, K, 3, 3).
        """

        def one(q_t):
            res = self.fk(params, q_t)
            return res.xpos[self.site_body], res.xmat()[self.site_body]

        return jax.vmap(one)(q)

    def m_opt(
        self,
        params: KinParams,
        keypoints: jnp.ndarray,
        q: jnp.ndarray,
        initial_offsets: jnp.ndarray,
        is_regularized: jnp.ndarray,
        reg_coef,
        n_frames_total=None,
        axis_name: str | None = None,
    ) -> MOptResult:
        """Closed-form marker-offset solve on sampled frames.

        keypoints: (T, K*3) flattened observations; q: (T, nq) fixed poses.
        With ``axis_name`` set, frame statistics psum across that mesh axis
        (the distributed m-phase; the math is associative over frames,
        ref stac_core.py:157-165).
        """
        T = keypoints.shape[0]
        K = self.site_idxs.shape[0]
        y = keypoints.reshape(T, K, 3)
        p_all, R_all = self.site_frames(params, q)
        return m_opt_closed_form(
            p_all,
            R_all,
            y,
            initial_offsets,
            is_regularized,
            reg_coef,
            n_frames_total=n_frames_total,
            axis_name=axis_name,
        )
