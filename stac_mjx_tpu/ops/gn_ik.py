"""Gauss-Newton IK with analytic geometric Jacobians — the TPU throughput solver.

Why this exists: the q-phase is a tiny nonlinear least-squares per frame
(<=K*3 residuals, <=nq unknowns). The reference solves it with up to 400
projected-gradient iterations (each costing an FK + autodiff backward pass);
a damped Gauss-Newton step on the *velocity manifold* converges in ~5-15
iterations, and the Jacobian comes from ONE forward pass via the classic
geometric construction (axis x (p - anchor)), not from 74 jacfwd tangents.
On a latency-bound TPU workload this cuts the sequential depth ~30x.

Parameterization: steps live in R^nv (MuJoCo dof space). Retraction:
  - slide/hinge: q + delta (1:1),
  - free translation: t + delta (world),
  - free/ball rotation: quat <- normalize(quat) * exp(delta_local) — a local
    (right-multiplied) rotation-vector increment.
The world axis of a local rotation dof i is R_body @ e_i, its anchor the
joint anchor, so dp/ddelta_i = (R e_i) x (p - anchor): all available from the
FK outputs (xanchor/xaxis/xquat).

Masking: a qpos mask maps to a dof mask; masked dof columns are zeroed, so
the damped normal equations give an exactly-zero step there and masked
coordinates hold their initial values (the make_qs invariant). Box bounds are
enforced by clipping the retracted iterate on all non-quaternion coordinates
(the reference's quaternion "box" of [-1, 1] never binds for unit
quaternions, stac_mjx/stac.py:23-24).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stac_mjx_tpu.models.kinematics import (
    JNT_BALL,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    KinParams,
    KinTopology,
    make_fk,
    make_fk_jump,
)
from stac_mjx_tpu.ops import quat as qm
from stac_mjx_tpu.ops.solver import PGResult
from stac_mjx_tpu.ops.spd import make_spd_solve, make_spd_solve_lanes


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exponential of a rotation vector (batched-safe)."""
    angle2 = jnp.sum(v * v, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    half = 0.5 * angle
    s = jnp.where(angle2 > 1e-16, jnp.sin(half) / angle, 0.5 - angle2 / 48.0)
    return jnp.concatenate([jnp.cos(half), v * s], axis=-1)


class GNIK:
    """Per-topology Gauss-Newton IK solver with analytic Jacobians."""

    def __init__(
        self,
        topo: KinTopology,
        site_idxs: np.ndarray,
        maxiter: int = 12,
        tol: float = 1e-8,
        damping_init: float = 1e-4,
        damping_inc: float = 10.0,
        damping_dec: float = 0.2,
        max_bad_steps: int = 4,
        fk_impl: str = "scan",
        linesearch: bool = True,
        spd_impl: str = "auto",
        stall_iters: int = 0,
        damping_rule: str = "nielsen",
    ):
        """linesearch=False selects the flat LM schedule: exactly one
        FK/Jacobian/loss evaluation per iteration with accept/reject +
        damping adaptation, no nested while_loop. Under vmap a nested
        linesearch makes every frame pay the slowest frame's trial count;
        the flat schedule keeps all lanes in lockstep.

        stall_iters: batched flat-LM early exit (VERDICT r3 #3a). A lane
        that fails to improve its loss by more than ``tol`` for this many
        consecutive iterations is FROZEN (its state stops updating), and
        the loop exits once every lane is frozen — converged batches stop
        paying FK/Jacobian/einsum/solve sweeps. Freezing is per-lane, so
        each lane's result depends only on its own trajectory: batch
        composition cannot change results, preserving the bitwise
        chunked==single-program guarantee. 0 (the default, matching
        StacConfig.gn_stall_iters — measured a strict loss on the
        flagship lockstep workloads) disables (fixed maxiter).

        damping_rule: flat-LM lambda adaptation. "nielsen" (default)
        uses the gain-ratio accept rule (Madsen, Nielsen & Tingleff,
        "Methods for Non-Linear Least Squares Problems", 2004, alg.
        3.16): on accept lam *= max(1/3, 1 - (2*rho - 1)^3) with rho =
        actual/predicted reduction, with two f32 adaptations — lam
        floored at 1e-7 (the rank-deficient-JtJ regularization floor)
        and rejects escalating by the bounded damping_inc instead of the
        textbook compounding nu-doubling (which overshoots the usable
        damping window in f32; see the body comments for the measured
        failure modes). "fixed" multiplies by damping_inc/damping_dec on
        reject/accept. Measured on the v5e rodent ik workload (10k
        frames, same fps at equal maxiter): nielsen reaches residual
        2.169/2.109/2.083/2.074 mm at 10/12/14/16 iterations where fixed
        reaches 2.621/2.402/2.264/2.176 — the gain-ratio schedule
        strictly dominates, buying ~2 iterations of quality."""
        self.topo = topo
        self.site_idxs = np.asarray(site_idxs)
        self.maxiter = maxiter
        self.tol = tol
        self.damping_init = damping_init
        self.damping_inc = damping_inc
        self.damping_dec = damping_dec
        self.max_bad_steps = max_bad_steps
        self.linesearch = linesearch
        self.stall_iters = stall_iters
        self.damping_rule = damping_rule
        # Normal-equation contraction form in solve_batch. "jmat"
        # materializes the (F, 3K, nv) Jacobian and contracts over its row
        # axis; "cols" contracts the (F, K, nv, 3) cols tensor directly
        # (no J materialization). Measured on v5e at F=2560: jmat 51.3 ms
        # vs cols 57.7 ms per 16-iteration solve — XLA's fused
        # transpose+dot beats the split (k, c) contraction, so jmat is the
        # default; the knob stays for re-measurement on other topologies.
        self.einsum_mode = "jmat"
        self.spd_solve = make_spd_solve(spd_impl)
        self.spd_solve_lanes = make_spd_solve_lanes(spd_impl)
        self.fk = (make_fk_jump if fk_impl == "jump" else make_fk)(topo)

        nq, njnt = topo.nq, topo.njnt
        jnt_dofadr = np.concatenate([[0], np.cumsum(topo.jnt_dofnum)])[:-1]
        nv = int(topo.jnt_dofnum.sum())
        self.nv = nv

        # --- per-dof static tables
        dof_jnt = np.zeros(nv, np.int32)  # owning joint
        dof_body = np.zeros(nv, np.int32)  # owning body
        dof_rot = np.zeros(nv, bool)  # rotational dof
        dof_local_rot = np.zeros(nv, bool)  # local-frame rot (free/ball)
        dof_axis_i = np.zeros(nv, np.int32)  # e_i index for local rot/trans
        dof_trans_world = np.zeros(nv, bool)  # free translation
        q2v = np.zeros((nq, nv), np.float32)  # scalar qpos <- dof scatter
        v_from_q = np.zeros((nv, nq), np.float32)  # qpos mask -> dof mask
        self.free_joints = []  # (qadr, dofadr)
        self.ball_joints = []  # (qadr, dofadr)

        for j in range(njnt):
            t = int(topo.jnt_type[j])
            qa = int(topo.jnt_qposadr[j])
            da = int(jnt_dofadr[j])
            b = int(topo.jnt_bodyid[j])
            if t in (JNT_HINGE, JNT_SLIDE):
                dof_jnt[da] = j
                dof_body[da] = b
                dof_rot[da] = t == JNT_HINGE
                q2v[qa, da] = 1.0
                v_from_q[da, qa] = 1.0
            elif t == JNT_FREE:
                self.free_joints.append((qa, da))
                for i in range(3):
                    dof_jnt[da + i] = j
                    dof_body[da + i] = b
                    dof_trans_world[da + i] = True
                    dof_axis_i[da + i] = i
                    v_from_q[da + i, qa + i] = 1.0
                for i in range(3):
                    d = da + 3 + i
                    dof_jnt[d] = j
                    dof_body[d] = b
                    dof_rot[d] = True
                    dof_local_rot[d] = True
                    dof_axis_i[d] = i
                    v_from_q[d, qa + 3 : qa + 7] = 1.0
            elif t == JNT_BALL:
                self.ball_joints.append((qa, da))
                for i in range(3):
                    d = da + i
                    dof_jnt[d] = j
                    dof_body[d] = b
                    dof_rot[d] = True
                    dof_local_rot[d] = True
                    dof_axis_i[d] = i
                    v_from_q[d, qa : qa + 4] = 1.0

        self.dof_jnt = dof_jnt
        self.dof_body = dof_body
        self.dof_rot = dof_rot
        self.dof_local_rot = dof_local_rot
        self.dof_axis_i = dof_axis_i
        self.dof_trans_world = dof_trans_world
        self.q2v = q2v
        self.v_from_q = v_from_q

        # --- subtree (ancestor) masks: site k moved by dof d?
        K = len(self.site_idxs)
        site_body = topo.site_bodyid[self.site_idxs]
        anc = np.zeros((K, nv), np.float32)
        for k in range(K):
            chain = set()
            b = int(site_body[k])
            while b != 0:
                chain.add(b)
                b = int(topo.body_parentid[b])
            for d in range(nv):
                if int(dof_body[d]) in chain:
                    anc[k, d] = 1.0
        self.site_dof_mask = anc

        # --- bounds clip mask: every qpos coordinate except quaternions.
        clipmask = np.ones(nq, bool)
        for j in range(njnt):
            t = int(topo.jnt_type[j])
            qa = int(topo.jnt_qposadr[j])
            if t == JNT_FREE:
                clipmask[qa + 3 : qa + 7] = False
            elif t == JNT_BALL:
                clipmask[qa : qa + 4] = False
        self.clip_mask = clipmask

    # ----------------------------------------------------------- retraction

    def retract(self, q: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        """Apply a dof-space step to qpos (local increments on quaternions)."""
        q_new = q + jnp.asarray(self.q2v, q.dtype) @ delta
        for qa, da in self.free_joints:
            q_new = q_new.at[qa : qa + 3].add(delta[da : da + 3])
            quat = qm.quat_normalize(q[qa + 3 : qa + 7])
            rot = quat_exp(delta[da + 3 : da + 6])
            q_new = q_new.at[qa + 3 : qa + 7].set(qm.quat_mul(quat, rot))
        for qa, da in self.ball_joints:
            quat = qm.quat_normalize(q[qa : qa + 4])
            rot = quat_exp(delta[da : da + 3])
            q_new = q_new.at[qa : qa + 4].set(qm.quat_mul(quat, rot))
        return q_new

    # ------------------------------------------------------------- jacobian

    def jacobian_cols(self, fkres) -> jnp.ndarray:
        """(K, nv, 3) Jacobian columns from one FK pass (cols[k, d, c] =
        d p_k_c / d delta_d), before the (3K, nv) matrix reshape."""
        p = fkres.site_xpos[self.site_idxs]  # (K, 3)
        dtype = p.dtype

        xmat = qm.quat_to_mat(fkres.xquat)  # (nbody, 3, 3)
        # World axis per dof.
        ax_scalar = fkres.xaxis[self.dof_jnt]  # hinge/slide
        ax_local = xmat[self.dof_body][
            np.arange(self.nv), :, self.dof_axis_i
        ]  # R e_i  (nv, 3)
        eye = jnp.asarray(np.eye(3, dtype=np.float32), dtype)
        ax_trans = eye[self.dof_axis_i]
        local = jnp.asarray(self.dof_local_rot[:, None])
        transw = jnp.asarray(self.dof_trans_world[:, None])
        axes = jnp.where(transw, ax_trans, jnp.where(local, ax_local, ax_scalar))
        # Anchor per dof: joint anchor (free local-rot anchors = body origin,
        # which equals the free joint's xanchor).
        anchors = fkres.xanchor[self.dof_jnt]

        rel = p[:, None, :] - anchors[None, :, :]  # (K, nv, 3)
        rot_cols = jnp.cross(axes[None, :, :], rel)  # (K, nv, 3)
        cols = jnp.where(jnp.asarray(self.dof_rot)[None, :, None], rot_cols, axes[None, :, :])
        return cols * jnp.asarray(self.site_dof_mask, dtype)[:, :, None]

    def jacobian(self, fkres) -> jnp.ndarray:
        """(3K, nv) site-position Jacobian from one FK pass.

        J[(k,c), d] = d p_k_c / d delta_d. (The batched flat-LM path can
        contract jacobian_cols directly instead — einsum_mode="cols" —
        but the J-materializing form measured faster on v5e; see
        __init__.)
        """
        cols = self.jacobian_cols(fkres)
        return jnp.transpose(cols, (0, 2, 1)).reshape(-1, self.nv)

    # ----------------------------------------------------- batched flat solve

    def solve_batch(
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
        """Flat LM over a whole frame batch natively: q0/kp_data are (F, ·).

        Identical math to the per-frame flat LM (``linesearch=False``) but
        expressed batched so the normal-equation solve runs through the
        batched SPD kernel (Pallas on TPU) instead of vmapping XLA's
        sequential Cholesky — the lockstep throughput path.

        ``qs_to_opt`` may be (nq,) — one mask shared by every frame — or
        (F, nq) with a mask per batch item. The per-item form is how the
        lockstep scheduler folds ALL per-part refinement solves into one
        sweep (parts ride the batch axis; pipeline.pose_optimization,
        part_opt_mode="batched"): same FLOPs as the sequential part loop but
        1/P the sequential depth and P× the lanes in every FK/einsum/SPD
        launch.

        ``maxiter`` (static) overrides the instance iteration cap for this
        solve — the hierarchical ik schedule's warm-started fine pass runs
        a shorter budget than the cold coarse pass
        (pipeline.ik_only_program).
        """
        from stac_mjx_tpu.ops.spd import LANE

        mi = self.maxiter if maxiter is None else int(maxiter)
        dtype = q0.dtype
        # Pad the frame axis to a lane-tile multiple ONCE, here — otherwise
        # the Pallas solve pads A/g inside every LM iteration (profiled at
        # ~30 ms/program on the rodent ik: pad fusions rewriting the full
        # normal-equation tensor each iteration). Dummy frames replicate the
        # last real frame; every per-frame computation is independent, so
        # real lanes are bit-identical and the pad is sliced off at return.
        F_orig = q0.shape[0]
        F = ((F_orig + LANE - 1) // LANE) * LANE
        per_item_qs = qs_to_opt.ndim == 2
        if F != F_orig:
            pad = F - F_orig
            q0 = jnp.concatenate(
                [q0, jnp.broadcast_to(q0[-1:], (pad, q0.shape[1]))]
            )
            kp_data = jnp.concatenate(
                [kp_data, jnp.broadcast_to(kp_data[-1:], (pad, kp_data.shape[1]))]
            )
            if per_item_qs:
                qs_to_opt = jnp.concatenate(
                    [
                        qs_to_opt,
                        jnp.broadcast_to(
                            qs_to_opt[-1:], (pad, qs_to_opt.shape[1])
                        ),
                    ]
                )
        big = jnp.asarray(1e10, dtype)
        lb_c = jnp.clip(lb, -big, big)
        ub_c = jnp.clip(ub, -big, big)
        clip_mask = jnp.asarray(self.clip_mask)
        kmask = kps_to_opt.astype(dtype)
        # dof mask: (1, nv) shared, or (F, nv) per item — broadcasting makes
        # every downstream use identical.
        dof_mask = (
            qs_to_opt.astype(dtype).reshape(-1, qs_to_opt.shape[-1])
            @ jnp.asarray(self.v_from_q, dtype).T
            > 0
        ).astype(dtype)
        fk_b = jax.vmap(self.fk, in_axes=(None, 0))
        jac_b = jax.vmap(self.jacobian)
        cols_b = jax.vmap(self.jacobian_cols)
        retract_b = jax.vmap(self.retract)
        K = len(self.site_idxs)
        kmask3 = kmask.reshape(K, 3)

        def project(q):
            return jnp.where(clip_mask, jnp.clip(q, lb_c, ub_c), q)

        def err_of(fkres):
            p = fkres.site_xpos[:, self.site_idxs].reshape(F, -1)
            return (p - kp_data) * kmask

        stall_n = self.stall_iters if self.stall_iters > 0 else mi + 1
        tol_gain = jnp.asarray(self.tol, dtype)

        nielsen = self.damping_rule == "nielsen"

        def body(state):
            k, q, lam, f_x, fkres, stall = state
            # A lane is FROZEN once it stalls stall_n consecutive iters:
            # its state stops updating, so its result is a function of its
            # own trajectory only (batch-composition independent), and the
            # loop exits when every lane is frozen.
            active = stall < stall_n
            e = err_of(fkres)
            # Normal equations built DIRECTLY in the Pallas kernel's
            # frames-in-lanes layout (n, n, F) — the einsum's output order
            # folds the relayout into the contraction epilogue instead of
            # moving ~0.5 GB/iter of HBM through explicit transposes. See
            # self.einsum_mode for the (measured) choice of contraction
            # form.
            # LM damping rides into the SPD kernel as a per-frame operand
            # (diagonal add on the VMEM-resident block) instead of an XLA
            # lam*I + A — that add was a full HBM read+write of the
            # (n, n, F) tensor per iteration (~7% of ik device time).
            if self.einsum_mode == "cols":
                cols = cols_b(fkres) * (
                    kmask3[None, :, None, :] * dof_mask[:, None, :, None]
                )
                A_l = jnp.einsum("fkdc,fkec->def", cols, cols)
                g_l = jnp.einsum("fkdc,fkc->df", cols, e.reshape(F, K, 3))
            else:
                J = jac_b(fkres) * (
                    kmask[None, :, None] * dof_mask[:, None, :]
                )
                A_l = jnp.einsum("frd,fre->def", J, J)
                g_l = jnp.einsum("frd,fr->df", J, e)
            delta = -self.spd_solve_lanes(A_l, g_l, lam).T * dof_mask
            q_new = project(retract_b(q, delta))
            fk_new = fk_b(params, q_new)
            e_new = err_of(fk_new)
            f_new = jnp.sum(e_new * e_new, axis=-1)
            ok = jnp.logical_and(f_new < f_x, active)
            gain = jnp.where(ok, f_x - f_new, jnp.zeros_like(f_x))
            q = jnp.where(ok[:, None], q_new, q)
            f_x = jnp.where(ok, f_new, f_x)
            fkres = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    ok.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                fk_new,
                fkres,
            )
            if nielsen:
                # Gain-ratio damping (Madsen-Nielsen-Tingleff alg. 3.16):
                # rho = actual / predicted reduction, with the predicted
                # reduction of the UNPROJECTED step delta solving
                # (JtJ + lam I) delta = -g:  pred = delta.(lam*delta - g).
                # On accept lam *= max(1/3, 1-(2*rho-1)^3) — near-GN steps
                # (rho ~ 1) cut lam hard, marginal ones leave it alone.
                # Scaling note (the 1/2): alg. 3.16 states the model
                # reduction of F = 1/2 e'e as L(0)-L(delta) =
                # 1/2 delta.(lam*delta - g). This code's loss carry f_x is
                # e'e = 2F, so `gain` below is 2x the textbook actual
                # reduction AND `pred` (without the 1/2) is 2x the textbook
                # predicted reduction — the factors cancel and rho IS
                # exactly the textbook gain ratio. (g = J'e is the gradient
                # of F, not of e'e, in both formulations; cross-checked
                # numerically in tests/test_gn_ik.py::test_nielsen_rho_
                # matches_textbook_gain_ratio.)
                pred = jnp.sum(delta * (lam[:, None] * delta - g_l.T), axis=-1)
                # rho from the PRE-update loss drop (`gain` captured
                # f_x - f_new before f_x was overwritten above).
                rho = gain / jnp.maximum(pred, jnp.asarray(1e-30, dtype))
                shrink = jnp.maximum(
                    jnp.asarray(1.0 / 3.0, dtype),
                    1.0 - (2.0 * rho - 1.0) ** 3,
                )
                # f32 adaptations of the textbook rule (which assumes
                # f64): (a) floor lam at 1e-7 — with a rank-deficient JtJ
                # (free-joint quaternion null space) lam IS the
                # regularizer, and shrinking it toward zero makes the f32
                # normal equations numerically singular; (b) rejects
                # escalate by the BOUNDED factor damping_inc instead of
                # the compounding nu-doubling — nu makes lam grow as
                # 2^(k(k+1)/2) across k rejects, which overshoots the
                # usable damping window in one or two steps and strands
                # lanes where the per-step improvement is below f32
                # epsilon (measured: lanes pegged at the lam ceiling with
                # frozen error; the accept test f_new < f_x then rejects
                # forever).
                lam_acc = jnp.clip(lam * shrink, 1e-7, 1e8)
                lam_rej = jnp.clip(lam * self.damping_inc, 1e-7, 1e8)
            else:
                lam_acc = lam * self.damping_dec
                lam_rej = lam * self.damping_inc
            lam = jnp.where(active, jnp.where(ok, lam_acc, lam_rej), lam)
            stall = jnp.where(gain > tol_gain, 0, stall + 1)
            return k + 1, q, lam, f_x, fkres, stall

        def cond(state):
            k, q, lam, f_x, fkres, stall = state
            return jnp.logical_and(
                k < mi, jnp.any(stall < stall_n)
            )

        q_start = project(q0)
        fk0 = fk_b(params, q_start)
        e0 = err_of(fk0)
        k, q, lam, f_x, _, _ = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.asarray(0, jnp.int32),
                q_start,
                jnp.full((F,), self.damping_init, dtype),
                jnp.sum(e0 * e0, axis=-1),
                fk0,
                jnp.zeros((F,), jnp.int32),
            ),
        )
        return PGResult(
            params=q[:F_orig],
            error=jnp.sqrt(f_x[:F_orig]),
            value=f_x[:F_orig],
            iters=jnp.full((F_orig,), 1, jnp.int32) * k,
            stepsize=1.0 / (1.0 + lam[:F_orig]),
        )

    # ----------------------------------------------------------------- solve

    def solve(
        self,
        params: KinParams,
        kp_data: jnp.ndarray,
        qs_to_opt: jnp.ndarray,
        kps_to_opt: jnp.ndarray,
        q0: jnp.ndarray,
        lb: jnp.ndarray,
        ub: jnp.ndarray,
    ) -> PGResult:
        """Damped GN solve of the masked marker objective from q0."""
        dtype = q0.dtype
        big = jnp.asarray(1e10, dtype)
        lb_c = jnp.clip(lb, -big, big)
        ub_c = jnp.clip(ub, -big, big)
        clip_mask = jnp.asarray(self.clip_mask)
        kmask = kps_to_opt.astype(dtype)
        dof_mask = (
            jnp.asarray(self.v_from_q, dtype) @ qs_to_opt.astype(dtype) > 0
        ).astype(dtype)
        eye = jnp.eye(self.nv, dtype=dtype)

        def project(q):
            return jnp.where(clip_mask, jnp.clip(q, lb_c, ub_c), q)

        def loss_of(q):
            p = self.fk(params, q).site_xpos[self.site_idxs].reshape(-1)
            e = (p - kp_data) * kmask
            return jnp.vdot(e, e)

        if not self.linesearch:
            # Flat LM: fixed iteration count, one trial per iteration,
            # accept/reject + damping adaptation. All vmap lanes stay in
            # lockstep (no nested data-dependent loop), and the FK of the
            # current iterate rides the carry so each iteration pays exactly
            # ONE FK: the trial point's FK serves both its loss evaluation
            # and, when accepted, the next iteration's Jacobian.
            def err_of(fkres):
                p = fkres.site_xpos[self.site_idxs].reshape(-1)
                return (p - kp_data) * kmask

            def body(k, state):
                q, lam, f_x, fkres = state
                e = err_of(fkres)
                J = self.jacobian(fkres) * (kmask[:, None] * dof_mask[None, :])
                A = J.T @ J + lam * eye
                g = J.T @ e
                delta = -self.spd_solve(A[None], g[None])[0] * dof_mask
                q_new = project(self.retract(q, delta))
                fk_new = self.fk(params, q_new)
                e_new = err_of(fk_new)
                f_new = jnp.vdot(e_new, e_new)
                ok = f_new < f_x
                q = jnp.where(ok, q_new, q)
                f_x = jnp.where(ok, f_new, f_x)
                fkres = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), fk_new, fkres
                )
                lam = jnp.where(
                    ok, lam * self.damping_dec, lam * self.damping_inc
                )
                return q, lam, f_x, fkres

            q_start = project(q0)
            fk0 = self.fk(params, q_start)
            e0 = err_of(fk0)
            q, lam, f_x, _ = jax.lax.fori_loop(
                0,
                self.maxiter,
                body,
                (
                    q_start,
                    jnp.asarray(self.damping_init, dtype),
                    jnp.vdot(e0, e0),
                    fk0,
                ),
            )
            return PGResult(
                params=q,
                error=jnp.sqrt(f_x),
                value=f_x,
                iters=jnp.asarray(self.maxiter, jnp.int32),
                stepsize=1.0 / (1.0 + lam),
            )

        def body(state):
            k, q, lam, step2, f_x = state
            fkres = self.fk(params, q)
            p = fkres.site_xpos[self.site_idxs].reshape(-1)
            e = (p - kp_data) * kmask
            J = self.jacobian(fkres) * (kmask[:, None] * dof_mask[None, :])
            JtJ = J.T @ J
            g = J.T @ e

            def try_step(carry):
                ls, lam_c, _, _, _ = carry
                A = JtJ + lam_c * eye
                L = jax.scipy.linalg.cho_factor(A, lower=True)
                delta = -jax.scipy.linalg.cho_solve(L, g) * dof_mask
                q_new = project(self.retract(q, delta))
                f_new = loss_of(q_new)
                ok = f_new < f_x
                return (
                    ls + 1,
                    jnp.where(ok, lam_c, lam_c * self.damping_inc),
                    q_new,
                    f_new,
                    ok,
                )

            def ls_cond(carry):
                ls, lam_c, q_new, f_new, ok = carry
                return jnp.logical_and(~ok, ls < self.max_bad_steps)

            carry = try_step(
                (jnp.asarray(0, jnp.int32), lam, q, f_x, jnp.asarray(False))
            )
            _, lam_used, q_new, f_new, ok = jax.lax.while_loop(
                ls_cond, try_step, carry
            )
            accepted = f_new < f_x
            q_next = jnp.where(accepted, q_new, q)
            f_next = jnp.where(accepted, f_new, f_x)
            lam_next = jnp.where(accepted, lam_used * self.damping_dec, lam_used)
            d = q_next - q
            step2 = jnp.where(accepted, jnp.vdot(d, d), jnp.asarray(0.0, dtype))
            return k + 1, q_next, lam_next, step2, f_next

        def cond(state):
            k, q, lam, step2, f_x = state
            keep = jnp.logical_or(k == 0, step2 > self.tol)
            return jnp.logical_and(k < self.maxiter, keep)

        q_start = project(q0)
        f0 = loss_of(q_start)
        init = (
            jnp.asarray(0, jnp.int32),
            q_start,
            jnp.asarray(self.damping_init, dtype),
            jnp.asarray(jnp.inf, dtype),
            f0,
        )
        k, q, lam, step2, f_x = jax.lax.while_loop(cond, body, init)
        return PGResult(
            params=q,
            error=jnp.sqrt(step2),
            value=f_x,
            iters=k,
            stepsize=1.0 / (1.0 + lam),
        )
