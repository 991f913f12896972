"""TPU-native forward-kinematics core.

This replaces the reference's dependence on MJX (`mujoco.mjx._src.smooth.kinematics`
/ `com_pos`, used via stac_mjx/utils.py:49-74) with a first-party, flat,
pytree-native kinematic model designed for XLA:

- The kinematic tree is grouped into **depth levels** at model-build time
  (host side). FK executes a *static* Python loop over levels; within a level
  all bodies are processed with vectorized gathers + quaternion math, so under
  ``jax.vmap`` over frames every op becomes a large (frames x bodies_in_level)
  VPU op with fully static shapes. No per-body scan, no data-dependent control
  flow — exactly what XLA wants.

- Joint handling is branchless: each body has up to ``max_slots`` padded joint
  slots; joint types are *static* numpy masks baked into the trace, so XLA
  constant-folds the selection.

Numerical semantics match MuJoCo's ``mj_kinematics`` (engine_core_smooth.c):
free joints set the frame directly from qpos with mju_normalize4 semantics;
ball/hinge/slide compose about the (possibly off-center) joint anchor with
displacements measured relative to ``qpos0``; the final body quaternion is
normalized before computing site frames. Golden-tested against
``mujoco.mj_kinematics`` in tests/test_fk.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stac_mjx_tpu.ops import quat as qm

# Joint type codes (match mujoco.mjtJoint ordering: FREE=0, BALL=1, SLIDE=2, HINGE=3).
JNT_FREE = 0
JNT_BALL = 1
JNT_SLIDE = 2
JNT_HINGE = 3
JNT_NONE = 4  # padding


class KinTopology:
    """Static (trace-time) description of the kinematic tree.

    Everything in here is host-side numpy and is closed over when tracing; it
    never appears as a jit argument. Built once per model by
    ``stac_mjx_tpu.models.builder``.
    """

    def __init__(
        self,
        *,
        nq: int,
        nv: int,
        nbody: int,
        nsite: int,
        njnt: int,
        body_parentid: np.ndarray,
        body_jntadr: np.ndarray,
        body_jntnum: np.ndarray,
        jnt_type: np.ndarray,
        jnt_qposadr: np.ndarray,
        jnt_bodyid: np.ndarray,
        site_bodyid: np.ndarray,
        body_names: list[str],
        jnt_names: list[str],
        site_names: list[str],
    ):
        self.nq = int(nq)
        self.nv = int(nv)
        self.nbody = int(nbody)
        self.nsite = int(nsite)
        self.njnt = int(njnt)
        self.body_parentid = np.asarray(body_parentid, dtype=np.int32)
        self.body_jntadr = np.asarray(body_jntadr, dtype=np.int32)
        self.body_jntnum = np.asarray(body_jntnum, dtype=np.int32)
        self.jnt_type = np.asarray(jnt_type, dtype=np.int32)
        self.jnt_qposadr = np.asarray(jnt_qposadr, dtype=np.int32)
        self.jnt_bodyid = np.asarray(jnt_bodyid, dtype=np.int32)
        self.site_bodyid = np.asarray(site_bodyid, dtype=np.int32)
        self.body_names = list(body_names)
        self.jnt_names = list(jnt_names)
        self.site_names = list(site_names)

        # --- depth levels: bodies grouped so every parent is in a prior level.
        depth = np.zeros(self.nbody, dtype=np.int32)
        for b in range(1, self.nbody):
            depth[b] = depth[self.body_parentid[b]] + 1
        self.levels: list[np.ndarray] = [
            np.nonzero(depth == d)[0].astype(np.int32)
            for d in range(1, int(depth.max()) + 1 if self.nbody > 1 else 1)
        ]

        # --- padded joint slots per body.
        self.max_slots = int(self.body_jntnum.max()) if self.njnt else 0
        ms = max(self.max_slots, 1)
        self.slot_jid = np.full((self.nbody, ms), -1, dtype=np.int32)
        self.slot_type = np.full((self.nbody, ms), JNT_NONE, dtype=np.int32)
        self.slot_qadr = np.zeros((self.nbody, ms), dtype=np.int32)
        for b in range(self.nbody):
            for s in range(int(self.body_jntnum[b])):
                j = int(self.body_jntadr[b]) + s
                self.slot_jid[b, s] = j
                self.slot_type[b, s] = int(self.jnt_type[j])
                self.slot_qadr[b, s] = int(self.jnt_qposadr[j])

        # --- padded per-level tables for the scan-over-levels FK.
        # Padding rows point at body 0 (the worldbody, identity frame with
        # zero body_pos / identity body_quat / no joints), so padded lanes
        # recompute the worldbody identity and their scatter is a no-op.
        self.n_levels = len(self.levels)
        self.level_pad = max((len(l) for l in self.levels), default=1)
        L, P, S = self.n_levels, self.level_pad, ms
        self.lv_body = np.zeros((L, P), dtype=np.int32)
        self.lv_parent = np.zeros((L, P), dtype=np.int32)
        self.lv_jid = np.zeros((L, P, S), dtype=np.int32)  # clamped; NONE-typed
        self.lv_jtype = np.full((L, P, S), JNT_NONE, dtype=np.int32)
        self.lv_qadr = np.zeros((L, P, S), dtype=np.int32)
        for li, lvl in enumerate(self.levels):
            n = len(lvl)
            self.lv_body[li, :n] = lvl
            self.lv_parent[li, :n] = self.body_parentid[lvl]
            self.lv_jid[li, :n] = np.maximum(self.slot_jid[lvl], 0)
            self.lv_jtype[li, :n] = self.slot_type[lvl]
            self.lv_qadr[li, :n] = self.slot_qadr[lvl]
        # Static scatter map: (level, lane, slot) -> joint id, valid slots only
        # (used to assemble per-joint world anchors/axes from the scan output).
        valid = (self.lv_jtype != JNT_NONE).ravel()
        self.slot_flat_idx = np.nonzero(valid)[0].astype(np.int32)
        self.slot_flat_jid = self.lv_jid.ravel()[self.slot_flat_idx]

        # qvel layout (for velocity inference parity with the reference).
        dof_per_type = {JNT_FREE: 6, JNT_BALL: 3, JNT_SLIDE: 1, JNT_HINGE: 1}
        self.jnt_dofnum = np.array(
            [dof_per_type[int(t)] for t in self.jnt_type], dtype=np.int32
        )

    def name2id(self, kind: str, name: str) -> int:
        table = {"body": self.body_names, "joint": self.jnt_names, "site": self.site_names}[kind]
        return table.index(name)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinParams:
    """Differentiable / updatable model arrays — the pytree half of the model.

    ``site_pos`` is the array the m-phase rewrites (the analog of
    mjx.Model.site_pos updated via stac_mjx/utils.py:109-126). All leaves can
    carry leading batch dims (e.g. per-clip models in ik_only, matching the
    reference's ``jax.vmap(mjx_setup)`` at stac_mjx/stac.py:393).
    """

    body_pos: jnp.ndarray  # (nbody, 3)
    body_quat: jnp.ndarray  # (nbody, 4)
    jnt_axis: jnp.ndarray  # (njnt, 3)
    jnt_pos: jnp.ndarray  # (njnt, 3)
    qpos0: jnp.ndarray  # (nq,)
    site_pos: jnp.ndarray  # (nsite, 3)
    site_quat: jnp.ndarray  # (nsite, 4)

    def set_site_pos(self, offsets: jnp.ndarray, site_idxs: jnp.ndarray) -> "KinParams":
        """Functional update of site offsets (ref: stac_mjx/utils.py:109-126)."""
        return dataclasses.replace(
            self, site_pos=self.site_pos.at[site_idxs].set(offsets)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FKResult:
    """World-frame frames produced by one FK pass (analog of mjx.Data fields)."""

    xpos: jnp.ndarray  # (nbody, 3) body frame origins
    xquat: jnp.ndarray  # (nbody, 4) body frame orientations (normalized)
    site_xpos: jnp.ndarray  # (nsite, 3) site world positions
    xanchor: jnp.ndarray  # (njnt, 3) joint anchors in world frame
    xaxis: jnp.ndarray  # (njnt, 3) joint axes in world frame

    def xmat(self) -> jnp.ndarray:
        """(nbody, 3, 3) rotation matrices (lazy; only the m-phase needs them)."""
        return qm.quat_to_mat(self.xquat)


def make_fk(topo: KinTopology):
    """Build the single-frame FK function for a fixed topology.

    Returns ``fk(params: KinParams, qpos: (nq,)) -> FKResult``. Batch over
    frames with ``jax.vmap(fk, in_axes=(None, 0))``; all shapes are static.

    The kinematic tree executes as a ``lax.scan`` over depth levels with a
    uniform padded level width, so the body is traced exactly once regardless
    of tree depth (rodent: 39 levels) and compile time stays flat. Under vmap
    each scan step becomes a (frames x level_pad) vectorized op.
    """
    n7 = np.arange(7)
    nq = topo.nq

    lv_xs = {
        "body": jnp.asarray(topo.lv_body),
        "parent": jnp.asarray(topo.lv_parent),
        "jid": jnp.asarray(topo.lv_jid),
        "jtype": jnp.asarray(topo.lv_jtype),
        "qadr": jnp.asarray(topo.lv_qadr),
    }

    def fk(params: KinParams, qpos: jnp.ndarray) -> FKResult:
        dtype = qpos.dtype
        xpos0 = jnp.zeros((topo.nbody, 3), dtype=dtype)
        xquat0 = jnp.zeros((topo.nbody, 4), dtype=dtype).at[:, 0].set(1.0)

        def step(carry, lv):
            xpos, xquat = carry
            b = lv["body"]
            pquat = xquat[lv["parent"]]
            pos = xpos[lv["parent"]] + qm.quat_rotate(pquat, params.body_pos[b])
            quat = qm.quat_mul(pquat, params.body_quat[b])

            anchors_out = []
            axes_out = []
            for s in range(topo.max_slots):
                jtype = lv["jtype"][:, s]
                qadr = lv["qadr"][:, s]
                jid = lv["jid"][:, s]

                axis = params.jnt_axis[jid]
                jpos = params.jnt_pos[jid]

                # Gathers, clamped so padded slots stay in-bounds.
                q1 = qpos[jnp.minimum(qadr, nq - 1)]
                q0ref = params.qpos0[jnp.minimum(qadr, nq - 1)]
                qv7 = qpos[jnp.minimum(qadr[:, None] + n7, nq - 1)]

                anchor = pos + qm.quat_rotate(quat, jpos)
                axis_w = qm.quat_rotate(quat, axis)

                is_free = (jtype == JNT_FREE)[:, None]
                is_ball = (jtype == JNT_BALL)[:, None]
                is_slide = (jtype == JNT_SLIDE)[:, None]
                is_hinge = (jtype == JNT_HINGE)[:, None]

                # FREE: frame set directly from qpos (mj_kinematics free path).
                free_pos = qv7[:, :3]
                free_quat = qm.quat_normalize(qv7[:, 3:7])

                # BALL: local quat from qpos, normalized, about the anchor.
                ball_qloc = qm.quat_normalize(qv7[:, :4])
                ball_quat = qm.quat_mul(quat, ball_qloc)
                ball_pos = anchor - qm.quat_rotate(ball_quat, jpos)

                # HINGE: axis-angle about local axis, displacement vs qpos0.
                hinge_qloc = qm.axis_angle_quat(axis, q1 - q0ref)
                hinge_quat = qm.quat_mul(quat, hinge_qloc)
                hinge_pos = anchor - qm.quat_rotate(hinge_quat, jpos)

                # SLIDE: translate along world axis, displacement vs qpos0.
                slide_pos = pos + axis_w * (q1 - q0ref)[:, None]

                pos = jnp.where(
                    is_free,
                    free_pos,
                    jnp.where(
                        is_ball,
                        ball_pos,
                        jnp.where(
                            is_hinge, hinge_pos,
                            jnp.where(is_slide, slide_pos, pos)
                        ),
                    ),
                )
                quat = jnp.where(
                    is_free,
                    free_quat,
                    jnp.where(
                        is_ball, ball_quat, jnp.where(is_hinge, hinge_quat, quat)
                    ),
                )

                # World anchors/axes as mj_kinematics stores them: computed in
                # the partial (pre-this-joint) frame; free joints anchor at
                # the qpos translation with the raw local axis.
                anchors_out.append(jnp.where(is_free, free_pos, anchor))
                axes_out.append(jnp.where(is_free, axis, axis_w))

            quat = qm.quat_normalize(quat)
            # Padded lanes target body 0 and recompute the worldbody identity,
            # so their scatter writes are value-preserving no-ops.
            xpos = xpos.at[b].set(pos)
            xquat = xquat.at[b].set(quat)
            ys = (
                jnp.stack(anchors_out, axis=1),  # (P, S, 3)
                jnp.stack(axes_out, axis=1),
            )
            return (xpos, xquat), ys

        (xpos, xquat), (anch_ys, axis_ys) = jax.lax.scan(
            step, (xpos0, xquat0), lv_xs
        )

        xanchor = jnp.zeros((max(topo.njnt, 1), 3), dtype=qpos.dtype)
        xaxis = jnp.zeros((max(topo.njnt, 1), 3), dtype=qpos.dtype)
        if topo.slot_flat_idx.size:
            flat_anch = anch_ys.reshape(-1, 3)[topo.slot_flat_idx]
            flat_axis = axis_ys.reshape(-1, 3)[topo.slot_flat_idx]
            xanchor = xanchor.at[topo.slot_flat_jid].set(flat_anch)
            xaxis = xaxis.at[topo.slot_flat_jid].set(flat_axis)

        sb = topo.site_bodyid
        site_xpos = xpos[sb] + qm.quat_rotate(xquat[sb], params.site_pos)
        return FKResult(
            xpos=xpos,
            xquat=xquat,
            site_xpos=site_xpos,
            xanchor=xanchor,
            xaxis=xaxis,
        )

    return fk


def make_fk_jump(topo: KinTopology):
    """Pointer-doubling FK: O(log depth) sequential steps instead of O(depth).

    Same result contract as ``make_fk`` (golden-tested against it and against
    ``mujoco.mj_kinematics``), different schedule:

    1. **Local pass** (fully parallel over bodies): each body's transform
       relative to its parent — body offset composed with its joint slots —
       plus every joint's anchor/axis expressed in the parent frame. One
       batched computation over all nbody bodies; no tree walk.
    2. **Doubling pass**: with ``P`` the parent pointer array,
       ``T[b] <- T[P[b]] . T[b]; P <- P[P]`` repeated ceil(log2(depth))
       times composes every body's chain to the world frame. The pointer
       arrays are static (precomputed on host), so each step is one batched
       quaternion compose + rotate over all bodies — for the rodent's
       39-deep tree this is 6 steps instead of 39, and under vmap each step
       is a single (frames x nbody) VPU op.

    Free joints override the composed frame entirely (their world transform
    comes straight from qpos), so their jump pointer is rewired to the world
    body. The throughput q-solver uses this FK; the scan FK remains the
    reference-shaped default.
    """
    n7 = np.arange(7)
    nq = topo.nq
    S = max(topo.max_slots, 1)

    # qpos reads as static one-hot matvecs instead of fancy-index gathers
    # (under vmap the matvec batches into one (F, nq) x (nq, ·) matmul;
    # bit-exact: each row has exactly one 1.0, so every product and
    # accumulation is exact). qv7 (the 7-wide window free/ball joints
    # need) is only built for slots that contain such joints; slots whose
    # joints are all hinge/slide read just the single qpos scalar.
    qv7_mats = []
    q1_mats = []
    slot_types_present: list[set] = []
    for s in range(S):
        idx = np.minimum(topo.slot_qadr[:, s][:, None] + n7, nq - 1)
        W = np.zeros((topo.nbody * 7, nq), np.float32)
        W[np.arange(topo.nbody * 7), idx.reshape(-1)] = 1.0
        qv7_mats.append(W)
        W1 = np.zeros((topo.nbody, nq), np.float32)
        W1[np.arange(topo.nbody), np.minimum(topo.slot_qadr[:, s], nq - 1)] = 1.0
        q1_mats.append(W1)
        slot_types_present.append(
            {int(t) for t in topo.slot_type[:, s]} - {JNT_NONE}
        )

    # Jump pointers: free-jointed bodies attach directly to world.
    jump_parent = topo.body_parentid.copy()
    has_free = np.zeros(topo.nbody, dtype=bool)
    for b in range(topo.nbody):
        if topo.max_slots and topo.slot_type[b, 0] == JNT_FREE:
            jump_parent[b] = 0
            has_free[b] = True

    depth = np.zeros(topo.nbody, dtype=np.int64)
    for b in range(1, topo.nbody):
        depth[b] = depth[jump_parent[b]] + 1
    max_depth = int(depth.max()) if topo.nbody > 1 else 0
    n_jumps = int(np.ceil(np.log2(max_depth))) if max_depth > 1 else max_depth

    # Precompute the static pointer array for each doubling step.
    ptr_steps = []
    P = jump_parent.astype(np.int32)
    for _ in range(n_jumps):
        ptr_steps.append(P)
        P = P[P]

    # Static scatter map for (body, slot) -> joint id over valid slots.
    valid = (topo.slot_type != JNT_NONE).ravel()
    flat_idx = np.nonzero(valid)[0].astype(np.int32)
    flat_jid = topo.slot_jid.ravel()[flat_idx]
    flat_parent = topo.body_parentid[
        (flat_idx // S).astype(np.int32)
    ]  # parent body of each valid joint's body

    slot_jid_c = np.maximum(topo.slot_jid, 0)

    def fk(params: KinParams, qpos: jnp.ndarray) -> FKResult:
        dtype = qpos.dtype

        # ---- local pass: parent-relative transforms, all bodies at once.
        # Branches are STATICALLY PRUNED per slot: a slot only pays for the
        # joint types it actually contains (e.g. the rodent's slots 1-2 are
        # extra hinges only — the free/ball/slide math and the 7-wide qpos
        # windows would be computed and discarded for every body). The
        # where-chain selects are disjoint static masks, so dropping absent
        # branches is value-preserving; FK is HBM-traffic-bound at batch,
        # and this removes ~3/4 of the local pass's intermediate tensors.
        t = params.body_pos
        q = params.body_quat
        anchors_p = []
        axes_p = []
        for s in range(topo.max_slots):
            jid = slot_jid_c[:, s]
            jtype = topo.slot_type[:, s]
            qadr = topo.slot_qadr[:, s]
            present = slot_types_present[s]
            has_free = JNT_FREE in present
            has_ball = JNT_BALL in present
            has_hinge = JNT_HINGE in present
            has_slide = JNT_SLIDE in present

            axis = params.jnt_axis[jid]
            jpos = params.jnt_pos[jid]
            if has_free or has_ball:
                qv7 = (
                    jnp.asarray(qv7_mats[s], qpos.dtype) @ qpos
                ).reshape(topo.nbody, 7)
                q1 = qv7[:, 0]
            else:
                qv7 = None
                q1 = jnp.asarray(q1_mats[s], qpos.dtype) @ qpos
            if has_hinge or has_slide:
                q0ref = params.qpos0[np.minimum(qadr, nq - 1)]
            if has_ball or has_hinge or has_slide:
                anchor = t + qm.quat_rotate(q, jpos)
                axis_w = qm.quat_rotate(q, axis)

            # (mask, value) branch lists, built only for present types;
            # masks are disjoint so the where-chain order is irrelevant.
            pos_branches = []
            quat_branches = []
            if has_slide:
                is_slide = jnp.asarray(jtype == JNT_SLIDE)[:, None]
                pos_branches.append(
                    (is_slide, t + axis_w * (q1 - q0ref)[:, None])
                )
            if has_hinge:
                is_hinge = jnp.asarray(jtype == JNT_HINGE)[:, None]
                hinge_qloc = qm.axis_angle_quat(axis, q1 - q0ref)
                hinge_quat = qm.quat_mul(q, hinge_qloc)
                pos_branches.append(
                    (is_hinge, anchor - qm.quat_rotate(hinge_quat, jpos))
                )
                quat_branches.append((is_hinge, hinge_quat))
            if has_ball:
                is_ball = jnp.asarray(jtype == JNT_BALL)[:, None]
                ball_qloc = qm.quat_normalize(qv7[:, :4])
                ball_quat = qm.quat_mul(q, ball_qloc)
                pos_branches.append(
                    (is_ball, anchor - qm.quat_rotate(ball_quat, jpos))
                )
                quat_branches.append((is_ball, ball_quat))
            if has_free:
                is_free = jnp.asarray(jtype == JNT_FREE)[:, None]
                free_pos = qv7[:, :3]
                pos_branches.append((is_free, free_pos))
                quat_branches.append((is_free, qm.quat_normalize(qv7[:, 3:7])))

            for mask, val in pos_branches:
                t = jnp.where(mask, val, t)
            for mask, val in quat_branches:
                q = jnp.where(mask, val, q)
            anch = anchor if (has_ball or has_hinge or has_slide) else t
            axw = axis_w if (has_ball or has_hinge or has_slide) else axis
            if has_free:
                anch = jnp.where(is_free, free_pos, anch)
                axw = jnp.where(is_free, axis, axw)
            anchors_p.append(anch)
            axes_p.append(axw)

        # Worldbody stays the identity frame.
        t = t.at[0].set(jnp.zeros(3, dtype=dtype))
        q = q.at[0].set(jnp.asarray([1.0, 0, 0, 0], dtype=dtype))

        # ---- doubling pass: static pointer gathers, log2(depth) steps.
        for P_k in ptr_steps:
            t = t[P_k] + qm.quat_rotate(q[P_k], t)
            q = qm.quat_mul(q[P_k], q)

        xquat = qm.quat_normalize(q)
        xpos = t

        # ---- world anchors/axes (free joints keep their qpos-native values).
        xanchor = jnp.zeros((max(topo.njnt, 1), 3), dtype=dtype)
        xaxis = jnp.zeros((max(topo.njnt, 1), 3), dtype=dtype)
        if flat_idx.size and topo.max_slots:
            anch_ps = jnp.stack(anchors_p, axis=1).reshape(-1, 3)[flat_idx]
            axis_ps = jnp.stack(axes_p, axis=1).reshape(-1, 3)[flat_idx]
            jt = topo.jnt_type[flat_jid]
            freej = jnp.asarray(jt == JNT_FREE)[:, None]
            pq = xquat[flat_parent]
            pt = xpos[flat_parent]
            anch_w = jnp.where(freej, anch_ps, pt + qm.quat_rotate(pq, anch_ps))
            axis_w = jnp.where(freej, axis_ps, qm.quat_rotate(pq, axis_ps))
            xanchor = xanchor.at[flat_jid].set(anch_w)
            xaxis = xaxis.at[flat_jid].set(axis_w)

        sb = topo.site_bodyid
        site_xpos = xpos[sb] + qm.quat_rotate(xquat[sb], params.site_pos)
        return FKResult(
            xpos=xpos,
            xquat=xquat,
            site_xpos=site_xpos,
            xanchor=xanchor,
            xaxis=xaxis,
        )

    return fk


def make_site_fk(topo: KinTopology, site_idxs: np.ndarray):
    """FK specialized to a subset of sites: returns (site_xpos_subset,).

    Used by the q-phase loss so the gather is fused into the FK trace.
    """
    fk = make_fk(topo)
    idx = np.asarray(site_idxs)

    def site_fk(params: KinParams, qpos: jnp.ndarray) -> jnp.ndarray:
        return fk(params, qpos).site_xpos[idx]

    return site_fk


def subtree_com(topo: KinTopology, body_mass: np.ndarray, body_ipos: np.ndarray):
    """Build a subtree center-of-mass function (analog of mjx ``com_pos``).

    The reference invokes ``com_pos`` in its loss (stac_mjx/stac_core.py:55)
    although site positions do not depend on it; we provide it for API parity
    and for downstream consumers, but the hot path omits it.
    """
    mass = np.asarray(body_mass, dtype=np.float64)
    ipos = np.asarray(body_ipos, dtype=np.float64)
    # Accumulate subtree mass bottom-up on host (static).
    subtree_mass = mass.copy()
    for b in range(topo.nbody - 1, 0, -1):
        subtree_mass[topo.body_parentid[b]] += subtree_mass[b]

    children: list[list[int]] = [[] for _ in range(topo.nbody)]
    for b in range(1, topo.nbody):
        children[topo.body_parentid[b]].append(b)
    # Postorder body list for the weighted-sum pass.
    order = list(range(topo.nbody - 1, -1, -1))

    def com(xpos: jnp.ndarray, xquat: jnp.ndarray) -> jnp.ndarray:
        ipos_j = jnp.asarray(ipos, dtype=xpos.dtype)
        mass_j = jnp.asarray(mass, dtype=xpos.dtype)
        xipos = xpos + qm.quat_rotate(xquat, ipos_j)
        weighted = xipos * mass_j[:, None]
        acc = weighted
        for b in order:
            for c in children[b]:
                acc = acc.at[b].add(acc[c])
        denom = jnp.asarray(np.maximum(subtree_mass, 1e-12), dtype=xpos.dtype)
        return acc / denom[:, None]

    return com
