"""STAC algorithm drivers as pure, jittable XLA programs.

TPU-native rework of the reference's `stac_mjx/compute_stac.py`: where the
reference drives per-frame jaxopt solves from a sequential Python loop
(compute_stac.py:256-267) and re-enters jit thousands of times, here the whole
fit / IK program is **one traced computation**:

- `pose_optimization`: `lax.scan` over frames (warm-started, preserving the
  reference's frame t <- t-1 dependency) with the per-part solve sequence
  statically unrolled; the scan body is traced once, so compile time is flat
  in clip length (the reference's vmap-of-Python-loop unrolls it).
- `root_optimization`: two successive root-only solves on one frame
  (parity with compute_stac.py:17-104).
- `offset_optimization`: the closed-form m-phase on a PRNGKey(0)-sampled
  frame subset (parity with compute_stac.py:107-167), functional site update.
- `fit_offsets_program` / `ik_only_program`: the complete alternation /
  batched IK as single programs; `ik_only` vmaps clips and shards them over a
  device mesh (the clip axis is embarrassingly parallel).

A `lockstep` pose mode solves all frames simultaneously (vmap) instead of
sequentially — the throughput path for TPU, at the cost of the reference's
warm-start semantics (both modes are provided; see SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from stac_mjx_tpu.models.kinematics import KinParams
from stac_mjx_tpu.ops.stac_core import StacCore, make_qs

# Batched part-opt item cap: above this the (P*F) one-sweep schedule falls
# back to the sequential part chain (see pose_optimization).
_PART_BATCH_MAX_ITEMS = 32768


@dataclasses.dataclass(frozen=True)
class StacConfigStatic:
    """Static (trace-time) pipeline configuration.

    Everything here is baked into the trace: iteration counts, masks, and the
    root-joint classification (free=7 / slide=4 root dims, fixed=skip;
    ref stac_mjx/stac.py:151-155, compute_stac.py:51-54).
    """

    n_iters: int
    n_sample_frames: int
    m_reg_coef: float
    root_kp_idx: int  # -1 => no root optimization
    root_dims: int  # 7 (free) or 4 (slide)
    do_root_opt: bool
    indiv_parts: tuple  # tuple of np.ndarray bool masks (nq,)
    trunk_kps: Any  # np.ndarray bool (K,)
    pose_mode: str = "sequential"  # "sequential" (parity) | "lockstep"
    # Successive root-only solves. 2 = the reference's two identical solves
    # (compute_stac.py:64-98) — required for parity. Lockstep mode defaults
    # to 1 (Stac resolves it): the second solve is a projected-gradient
    # mop-up quirk; with the GN solvers it changes the residual at noise
    # level while costing a full batched solve (measured +15% ik throughput
    # removing it).
    root_opt_passes: int = 2
    # Per-part refinement scheduling (lockstep mode only):
    # "sequential" — the reference's order: part p's solve starts from the
    #   q updated by part p-1 (compute_stac.py:233-250).
    # "batched" — all parts solve simultaneously from the full-pass result,
    #   folded into ONE batched sweep (parts ride the frame/batch axis of
    #   solve_batch); each part's masked dims are then written back in part
    #   order. Documented divergence: parts don't see each other's updates —
    #   with the GN solvers the full pass has already converged and the part
    #   masks are (near-)disjoint limbs, so the delta is noise-level while
    #   the sequential depth drops from (1+P) to 2 solves.
    part_opt_mode: str = "sequential"
    # Hierarchical (multigrid-in-time) lockstep ik: solve every
    # ``hier_stride``-th frame cold at the full iteration budget, seed the
    # remaining frames by quaternion-aware interpolation (nlerp) of the
    # coarse solutions, then refine ALL frames warm in
    # ``hier_fine_iters`` iterations (0 = auto). Both passes are full
    # lockstep batches. 0/1 disables. gn-lm only (other solvers ignore
    # it). See config.py StacConfig.ik_hier_stride for measurements.
    hier_stride: int = 0
    hier_fine_iters: int = 0
    # Lockstep fit: >0 makes pose passes after the first warm-start
    # every frame from ITS OWN previous-pass solution (instead of
    # broadcasting the scalar pose carry) at this shorter budget. 0 (the
    # default) keeps the full-budget carry schedule — measured the
    # better default at the reference's 250-frame fit shape, which is
    # pass-overhead-bound (see config.py StacConfig.fit_warm_iters).
    fit_warm_iters: int = 0


# ---------------------------------------------------------------- root phase


def root_optimization(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_frame: jnp.ndarray,
    q0: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
) -> jnp.ndarray:
    """Successive root-only solves, seeded from the root keypoint.

    Parity with compute_stac.py:17-104: q[:3] is seeded from the root
    keypoint's xyz before every pass; only the first `root_dims` qpos
    entries are optimized, against trunk keypoints only. The reference runs
    exactly two identical passes; `cfg.root_opt_passes` keeps that for
    parity and lets the lockstep throughput path run one (see
    StacConfigStatic.root_opt_passes).
    """
    root_xyz = jax.lax.dynamic_slice(
        kp_frame, (3 * cfg.root_kp_idx,), (3,)
    )
    qs_to_opt = jnp.zeros_like(q0, dtype=bool).at[: cfg.root_dims].set(True)
    kps_to_opt = jnp.repeat(jnp.asarray(cfg.trunk_kps), 3).astype(q0.dtype)

    q = q0
    for _ in range(cfg.root_opt_passes):
        q = q.at[:3].set(root_xyz)
        res = core.q_opt(params, kp_frame, qs_to_opt, kps_to_opt, q, lb, ub)
        q = make_qs(q, qs_to_opt, res.params)
    return q


def root_optimization_batch(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_frames: jnp.ndarray,
    q0: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
) -> jnp.ndarray:
    """root_optimization for C clips at once: kp_frames/q0 are (C, ·).

    Same per-clip math through the natively-batched solver — clips ride the
    batch axis of q_opt_batch instead of 40 vmapped single-frame solves
    (each of which pads its one system to a full 128-lane Pallas tile).
    """
    root_xyz = kp_frames[:, 3 * cfg.root_kp_idx : 3 * cfg.root_kp_idx + 3]
    qs_to_opt = (
        jnp.zeros(q0.shape[-1], dtype=bool).at[: cfg.root_dims].set(True)
    )
    kps_to_opt = jnp.repeat(jnp.asarray(cfg.trunk_kps), 3).astype(q0.dtype)

    q = q0
    for _ in range(cfg.root_opt_passes):
        q = q.at[:, :3].set(root_xyz)
        res = core.q_opt_batch(
            params, kp_frames, qs_to_opt, kps_to_opt, q, lb, ub
        )
        q = make_qs(q, qs_to_opt, res.params)
    return q


# ---------------------------------------------------------------- pose phase


def _quat_spans(topo) -> tuple:
    """Static qpos spans holding unit quaternions (free: qadr+3, ball: qadr)."""
    spans = []
    for j in range(topo.njnt):
        t = int(topo.jnt_type[j])
        qa = int(topo.jnt_qposadr[j])
        if t == 0:  # free
            spans.append(qa + 3)
        elif t == 1:  # ball
            spans.append(qa)
    return tuple(spans)


def interp_seeds(
    topo, q_coarse: jnp.ndarray, stride: int, n_frames: int
) -> jnp.ndarray:
    """Per-frame warm starts from strided coarse solves (hierarchical ik).

    q_coarse: (C, Fcc, nq) — poses of frames 0, s, 2s, ... of each clip.
    Returns (C, n_frames, nq): frame t seeds from the linear interpolation
    of its bracketing coarse frames, with quaternion spans sign-aligned
    before the lerp and renormalized after (nlerp — exact for the small
    inter-frame rotations of mocap, and only a SEED either way: the warm
    fine pass refines it). Frames past the last coarse frame clamp to it.
    """
    C, Fcc, nq = q_coarse.shape
    t = np.arange(n_frames)
    il = np.minimum(t // stride, Fcc - 1)
    ir = np.minimum(il + 1, Fcc - 1)
    w = jnp.asarray(
        ((t - il * stride) / stride).astype(np.float32), q_coarse.dtype
    )[None, :, None]
    left = q_coarse[:, il]
    right = q_coarse[:, ir]
    seed = left * (1.0 - w) + right * w
    for a in _quat_spans(topo):
        lq = left[..., a : a + 4]
        rq = right[..., a : a + 4]
        dot = jnp.sum(lq * rq, axis=-1, keepdims=True)
        rq = jnp.where(dot < 0, -rq, rq)
        q = lq * (1.0 - w) + rq * w
        norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
        seed = seed.at[..., a : a + 4].set(q / norm)
    return seed


def _solve_frame(core, cfg, params, q0, kp_t, lb, ub, kps_to_opt, qs_all):
    """Full-q solve followed by the statically-unrolled per-part solves.

    Parity with compute_stac.py:216-252: the full solve's result replaces the
    whole q vector; each part solve is re-masked through make_qs. The returned
    error is the last solve's solver residual (compute_stac.py:252).
    """
    res = core.q_opt(params, kp_t, qs_all, kps_to_opt, q0, lb, ub)
    q = res.params
    err = res.error
    for part in cfg.indiv_parts:
        part_mask = jnp.asarray(part)
        res = core.q_opt(params, kp_t, part_mask, kps_to_opt, q, lb, ub)
        q = make_qs(q, part_mask, res.params)
        err = res.error
    return q, err


def pose_optimization(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_data: jnp.ndarray,
    q_init: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    maxiter: int | None = None,
    root_reseed: bool = True,
):
    """Pose solves over a clip.

    sequential mode: lax.scan over frames, frame t warm-started from t-1
    (the reference's data dependency, compute_stac.py:256-267).
    lockstep mode: all frames initialized independently (root xyz seeded from
    each frame's root keypoint when available) and solved in one vmap — the
    TPU throughput path.

    root_reseed (lockstep only): overwrite each frame's warm-start root
    translation with that frame's raw root-keypoint xyz. Measured r5
    (v5e rodent): the right choice depends on whether the offsets the
    warm start was solved against are still current. The hierarchical
    ik fine pass runs at FIXED offsets, so its nlerp-interpolated
    translation is informative and keeping it wins (False there:
    fine=8 residual 2.0437 vs 2.0662 mm re-seeded). The fit warm passes
    run after an m-phase moved the offsets, so the previous pass's
    translation is stale and the raw keypoint anchor wins (True there:
    final fit error 1.250 vs 1.695 mm kept, and faster).

    Returns (q_final_carry, qposes (F,nq), xposes, xquats, marker_sites,
    errors (F,)). ``errors`` is the per-frame mean marker Euclidean
    distance in meters — a config-independent quality measure (the same
    number whichever q_solver produced the poses), NOT the solver-native
    convergence diagnostic (that stays inside PGResult; see
    ops/solver.PGResult).
    """
    kps_to_opt = jnp.ones(kp_data.shape[1], dtype=kp_data.dtype)
    qs_all = jnp.ones(q_init.shape[-1], dtype=bool)

    if cfg.pose_mode == "lockstep":
        F = kp_data.shape[0]
        # q_init may be (nq,) — one warm start broadcast to every frame —
        # or (F, nq) with a per-frame start (the flattened multi-clip ik
        # passes each frame its own clip's root solve).
        if q_init.ndim == 2:
            q0b = q_init
        else:
            q0b = jnp.broadcast_to(q_init, (F, q_init.shape[0]))
        if cfg.root_kp_idx >= 0 and cfg.do_root_opt and root_reseed:
            root_xyz = jax.lax.dynamic_slice(
                kp_data, (0, 3 * cfg.root_kp_idx), (F, 3)
            )
            q0b = q0b.at[:, :3].set(root_xyz)

        # Full-q pass then statically-unrolled part passes, each over the
        # whole batch at once (the Pallas SPD kernel solves every frame's
        # normal equations in a single sweep; see _solve_frame for the
        # per-frame parity semantics).
        res = core.q_opt_batch(
            params, kp_data, qs_all, kps_to_opt, q0b, lb, ub,
            maxiter=maxiter,
        )
        qposes = res.params
        # The batched part schedule materializes a (P*F, ·) sweep — ~P× the
        # full pass's FK/Jacobian/normal-equation working set lives in HBM
        # at once (ADVICE r3). Past this bound fall back to the sequential
        # part chain, which peaks at the full pass's footprint. At ~100 KB
        # per item the cap is ~3 GB of transient solver state.
        part_batched = (
            cfg.indiv_parts
            and cfg.part_opt_mode == "batched"
            and len(cfg.indiv_parts) * kp_data.shape[0]
            <= _PART_BATCH_MAX_ITEMS
        )
        if part_batched:
            # All P part solves in ONE sweep: parts ride the batch axis
            # ((P*F, ·) items, per-item q masks), then each part's masked
            # dims write back in part order. See StacConfigStatic.
            P = len(cfg.indiv_parts)
            part_masks = jnp.asarray(np.stack(cfg.indiv_parts))  # (P, nq)
            kp_pf = jnp.tile(kp_data, (P, 1))
            q0_pf = jnp.tile(qposes, (P, 1))
            qs_pf = jnp.repeat(part_masks, F, axis=0)
            res = core.q_opt_batch(
                params, kp_pf, qs_pf, kps_to_opt, q0_pf, lb, ub
            )
            sols = res.params.reshape(P, F, -1)
            for i, part in enumerate(cfg.indiv_parts):
                qposes = make_qs(qposes, jnp.asarray(part), sols[i])
        else:
            for part in cfg.indiv_parts:
                part_mask = jnp.asarray(part)
                res = core.q_opt_batch(
                    params, kp_data, part_mask, kps_to_opt, qposes, lb, ub
                )
                qposes = make_qs(qposes, part_mask, res.params)
        q_last = qposes[-1]
    else:
        def step(q_carry, kp_t):
            q, err = _solve_frame(
                core, cfg, params, q_carry, kp_t, lb, ub, kps_to_opt, qs_all
            )
            return q, (q, err)

        q_last, (qposes, _solver_errors) = jax.lax.scan(step, q_init, kp_data)

    fk_res = jax.vmap(core.fk, in_axes=(None, 0))(params, qposes)
    marker_sites = fk_res.site_xpos[:, core.site_idxs]
    # Config-independent per-frame quality: mean marker distance (meters).
    kp_xyz = kp_data.reshape(kp_data.shape[0], -1, 3)
    errors = jnp.linalg.norm(kp_xyz - marker_sites, axis=-1).mean(axis=-1)
    return q_last, qposes, fk_res.xpos, fk_res.xquat, marker_sites, errors


# -------------------------------------------------------------- offset phase


def offset_optimization(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_data: jnp.ndarray,
    offsets_prev: jnp.ndarray,
    qposes: jnp.ndarray,
    is_regularized: jnp.ndarray,
    axis_name: str | None = None,
    n_shards: int = 1,
):
    """Sample frames, closed-form m-solve, write offsets into the model.

    Parity with compute_stac.py:107-167 including the fixed PRNGKey(0)
    permutation sampling. The regularization target is the *previous*
    iteration's offsets, exactly as the reference threads self._offsets
    (stac_mjx/stac.py:317-328).

    Sharded path (``axis_name`` + ``n_shards > 1``, called from inside
    shard_map): each shard samples ceil(n_sample / n_shards) of ITS local
    frames with a shard-folded key, and the m-solve's frame statistics
    psum over the axis. This deliberately differs from the single-program
    global PRNGKey(0) permutation (which cannot be reproduced shard-locally
    without a global gather); the m-phase is a mean estimator, so the
    estimate is equally valid — documented divergence, distributed mode
    only.
    """
    n_frames = kp_data.shape[0]
    if axis_name is not None and n_shards > 1:
        n_sample = min(-(-cfg.n_sample_frames // n_shards), n_frames)
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), jax.lax.axis_index(axis_name)
        )
        n_total = n_sample * n_shards
    else:
        n_sample = min(cfg.n_sample_frames, n_frames)
        key = jax.random.PRNGKey(0)
        n_total = None
    shuffled = jax.random.permutation(
        key, jnp.arange(n_frames), independent=True
    )
    idx = shuffled[:n_sample]

    keypoints = kp_data[idx]
    q = qposes[idx]

    res = core.m_opt(
        params,
        keypoints,
        q,
        offsets_prev,
        is_regularized,
        cfg.m_reg_coef,
        n_frames_total=n_total,
        axis_name=axis_name,
    )
    new_params = params.set_site_pos(res.params, jnp.asarray(core.site_idxs))
    return new_params, res.params, res.error


# ------------------------------------------------------------- full programs


def fit_offsets_program(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_data: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    is_regularized: jnp.ndarray,
    return_full: bool = True,
):
    """The full alternating calibration as one pure program.

    Mirrors Stac.fit_offsets (stac_mjx/stac.py:253-354): optional root
    optimization on frame 0, then N_ITERS x (pose pass, offset pass), then a
    final pose pass. The pose warm-start carry chains across passes exactly
    like the reference's persistent mjx_data.qpos.

    Returns a dict of outputs (qposes, xposes, xquats, marker_sites, offsets,
    per-iteration error stats). return_full=False drops xpos/xquat/
    marker_sites from the dict — XLA dead-code-eliminates their final-pass
    computation, and the D2H payload shrinks to offsets + qpos + errors
    (the ik path's transfer discipline, VERDICT r3 weak #5); derive the
    rest on demand with Stac.compute_full_outputs(qpos).
    """
    q = params.qpos0
    offsets = params.site_pos[jnp.asarray(core.site_idxs)]
    params = params.set_site_pos(offsets, jnp.asarray(core.site_idxs))

    if cfg.do_root_opt and cfg.root_kp_idx >= 0:
        q = root_optimization(core, cfg, params, kp_data[0], q, lb, ub)

    # Lockstep warm passes: after the first pose pass, every frame
    # restarts from its own previous solution with a shorter budget (see
    # StacConfigStatic.fit_warm_iters). The broadcast-the-carry start the
    # sequential mode uses is kept for parity mode.
    lockstep = cfg.pose_mode == "lockstep"
    warm_iters = cfg.fit_warm_iters if cfg.fit_warm_iters > 0 else None

    iter_errors = []
    q_warm = None
    for _ in range(cfg.n_iters):
        q_init = q_warm if (lockstep and q_warm is not None) else q
        mi = warm_iters if q_warm is not None else None
        # root_reseed stays True for warm passes: the m-phase just moved
        # the offsets, so last pass's solved translation is stale — the
        # raw keypoint anchor measured strictly better (pose_optimization
        # docstring, r5).
        q, qposes, _, _, _, errors = pose_optimization(
            core, cfg, params, kp_data, q_init, lb, ub, maxiter=mi
        )
        q_warm = qposes if (lockstep and warm_iters is not None) else None
        params, offsets, m_err = offset_optimization(
            core, cfg, params, kp_data, offsets, qposes, is_regularized
        )
        iter_errors.append((errors, m_err))

    q_init = q_warm if (lockstep and q_warm is not None) else q
    mi = warm_iters if q_warm is not None else None
    q, qposes, xposes, xquats, marker_sites, errors = pose_optimization(
        core, cfg, params, kp_data, q_init, lb, ub, maxiter=mi
    )

    out = {
        "qpos": qposes,
        "offsets": offsets,
        "frame_error": errors,
        "iter_frame_errors": (
            jnp.stack([fe for fe, _ in iter_errors])
            if iter_errors
            else jnp.zeros((0, kp_data.shape[0]), kp_data.dtype)
        ),
        "iter_m_errors": (
            jnp.stack([me for _, me in iter_errors])
            if iter_errors
            else jnp.zeros((0,), kp_data.dtype)
        ),
    }
    if return_full:
        out["xpos"] = xposes
        out["xquat"] = xquats
        out["marker_sites"] = marker_sites
    return out


def fit_offsets_sharded(
    core: StacCore,
    cfg: StacConfigStatic,
    mesh,
    axis_name: str,
):
    """Build the frame-sharded fit program: shard_map over ``axis_name``.

    The q-phase (lockstep pose solves) runs embarrassingly parallel on each
    shard's frames; the m-phase reduces its closed-form statistics with psum
    (SURVEY.md §5.8 — the layer the reference lacks). Root optimization runs
    per shard on the shard's first frame (a local warm start; the
    single-program path warm-starts every frame from global frame 0's root
    solve instead — documented divergence of the distributed mode).

    Returns a callable (params, kp_global, lb, ub, is_regularized) -> dict
    with the same output schema as fit_offsets_program; wrap it in jax.jit.
    kp_global must be sharded (n_shards * F_local, K*3) over ``axis_name``.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if cfg.pose_mode != "lockstep":
        raise ValueError(
            "fit_offsets_sharded requires pose_mode=lockstep: the "
            "sequential warm-start chain is a cross-frame dependency that "
            "cannot shard over frames"
        )
    n_shards = int(np.prod(mesh.devices.shape))

    def shard_body(params, kp_local, lb, ub, is_regularized):
        q = params.qpos0
        offsets = params.site_pos[jnp.asarray(core.site_idxs)]

        if cfg.do_root_opt and cfg.root_kp_idx >= 0:
            q = root_optimization(core, cfg, params, kp_local[0], q, lb, ub)

        # Same warm-pass schedule as fit_offsets_program (off unless
        # fit_warm_iters > 0).
        warm_iters = cfg.fit_warm_iters if cfg.fit_warm_iters > 0 else None
        iter_errors = []
        q_warm = None
        for _ in range(cfg.n_iters):
            q_init = q_warm if q_warm is not None else q
            mi = warm_iters if q_warm is not None else None
            q, qposes, _, _, _, errors = pose_optimization(
                core, cfg, params, kp_local, q_init, lb, ub, maxiter=mi
            )
            q_warm = qposes if warm_iters is not None else None
            params, offsets, m_err = offset_optimization(
                core,
                cfg,
                params,
                kp_local,
                offsets,
                qposes,
                is_regularized,
                axis_name=axis_name,
                n_shards=n_shards,
            )
            iter_errors.append((errors, m_err))

        q_init = q_warm if q_warm is not None else q
        mi = warm_iters if q_warm is not None else None
        q, qposes, xposes, xquats, marker_sites, errors = pose_optimization(
            core, cfg, params, kp_local, q_init, lb, ub, maxiter=mi
        )
        iter_frame = (
            jnp.stack([fe for fe, _ in iter_errors])
            if iter_errors
            else jnp.zeros((0, kp_local.shape[0]), kp_local.dtype)
        )
        iter_m = (
            jnp.stack([me for _, me in iter_errors])
            if iter_errors
            else jnp.zeros((0,), kp_local.dtype)
        )
        return (
            qposes,
            xposes,
            xquats,
            marker_sites,
            offsets,
            errors,
            iter_frame,
            iter_m,
        )

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P(), P()),
        out_specs=(
            P(axis_name),  # qposes
            P(axis_name),  # xposes
            P(axis_name),  # xquats
            P(axis_name),  # marker_sites
            P(),  # offsets (psum'd -> replicated)
            P(axis_name),  # per-frame errors
            P(None, axis_name),  # per-iter frame errors
            P(),  # per-iter m errors (replicated)
        ),
        check_vma=False,
    )

    def run(params, kp_global, lb, ub, is_regularized):
        out = sharded(params, kp_global, lb, ub, is_regularized)
        keys = (
            "qpos",
            "xpos",
            "xquat",
            "marker_sites",
            "offsets",
            "frame_error",
            "iter_frame_errors",
            "iter_m_errors",
        )
        return dict(zip(keys, out))

    return run


def ik_sequential_segment(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    kp_seg: jnp.ndarray,
    q_carry: jnp.ndarray,
    offsets: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    return_full: bool = True,
    first_segment: bool = False,
):
    """One bounded-runtime segment of the sequential (parity) IK.

    Splits ik_only_program's per-clip lax.scan at segment boundaries: the
    warm-start chain is carried between host dispatches as a tiny on-device
    (C, nq) array, so a 250-frame parity clip runs as 25 ten-frame programs
    instead of one minutes-long sequential program (which kills
    tunnel-attached TPU workers). lax.scan is sequential application of the
    step function, so scanning S frames from the carried q is numerically
    identical to the corresponding slice of the monolithic scan — asserted
    bitwise in tests/test_pipeline.py::test_ik_sequential_segments_match.

    kp_seg: (C, S, K*3) — an S-frame slice of every clip. q_carry: (C, nq);
    pass params.qpos0 broadcast for the first segment. first_segment=True
    additionally runs the per-clip root optimization on kp_seg[:, 0],
    exactly as ik_only_program does on each clip's frame 0.
    Returns (q_carry_out, *outputs) with ik_only_program's output schema.
    """
    if cfg.pose_mode != "sequential":
        raise ValueError("segmented ik requires pose_mode=sequential")
    params = params.set_site_pos(offsets, jnp.asarray(core.site_idxs))

    def per_clip(kp_clip, q0):
        q = q0
        if first_segment and cfg.do_root_opt and cfg.root_kp_idx >= 0:
            q = root_optimization(core, cfg, params, kp_clip[0], q, lb, ub)
        q_last, qposes, xposes, xquats, marker_sites, errors = (
            pose_optimization(core, cfg, params, kp_clip, q, lb, ub)
        )
        if not return_full:
            return q_last, qposes, errors
        return q_last, qposes, xposes, xquats, marker_sites, errors

    return jax.vmap(per_clip)(kp_seg, q_carry)


def ik_only_program(
    core: StacCore,
    cfg: StacConfigStatic,
    params: KinParams,
    batched_kp: jnp.ndarray,
    offsets: jnp.ndarray,
    lb: jnp.ndarray,
    ub: jnp.ndarray,
    return_full: bool = True,
):
    """Batched IK over clips with frozen offsets, as one program.

    Mirrors Stac.ik_only (stac_mjx/stac.py:356-454): per-clip root
    optimization on the clip's first frame, then the pose pass; clips map
    over the leading axis. Because clips are independent, sharding
    `batched_kp` over a device mesh parallelizes this with zero collectives
    (the TPU distribution layer; SURVEY.md §2.3/§5.8).

    return_full=False returns only (qposes, errors): on tunnel-attached
    chips the D2H transfer of xpos/xquat/marker_sites dominates end-to-end
    time (~6x the qpos bytes on the rodent), and XLA dead-code-eliminates
    what isn't fetched. Derive the full outputs later from qpos via one
    batched FK (Stac.compute_full_outputs).

    Lockstep scheduling runs the WHOLE multi-clip workload as one flat
    batch: the per-clip root solves batch across clips (one q_opt_batch of
    C items instead of C vmapped single-frame solves, each of which padded
    its one system to a full 128-lane Pallas tile), then every frame of
    every clip rides a single solve_batch whose per-frame warm start is
    its clip's root solution. Per-lane results are identical to the
    vmapped per-clip formulation (lanes are independent in solve_batch);
    the Pallas/einsum launches just get C-fold wider. Sequential mode
    keeps the per-clip scan under vmap (the warm-start chain is per clip).
    """
    params = params.set_site_pos(offsets, jnp.asarray(core.site_idxs))

    if cfg.pose_mode == "lockstep":
        C, Fc = batched_kp.shape[0], batched_kp.shape[1]
        nq = params.qpos0.shape[-1]
        if cfg.do_root_opt and cfg.root_kp_idx >= 0:
            roots = root_optimization_batch(
                core,
                cfg,
                params,
                batched_kp[:, 0],
                jnp.broadcast_to(params.qpos0, (C, nq)),
                lb,
                ub,
            )
        else:
            roots = jnp.broadcast_to(params.qpos0, (C, nq))
        kp_flat = batched_kp.reshape(C * Fc, -1)
        use_hier = (
            cfg.hier_stride > 1
            and core.q_solver_kind == "gn"
            and not core.gnik.linesearch
        )
        fine_iters = None
        if use_hier:
            # Hierarchical (multigrid-in-time) schedule: cold-solve every
            # s-th frame at the full budget, nlerp-interpolate seeds for
            # all frames, refine warm in hier_fine_iters. Mocap changes
            # slowly between frames, so the interpolated seed is already
            # near the optimum; total iteration cost drops from maxiter
            # to ~maxiter/s + fine_iters per frame. Not bitwise-identical
            # to the flat schedule (different starts) — quality is
            # measured, see config.py StacConfig.ik_hier_stride.
            s_h = int(cfg.hier_stride)
            idx_c = np.arange(0, Fc, s_h)
            nq_ = params.qpos0.shape[-1]
            kp_c = batched_kp[:, idx_c].reshape(C * len(idx_c), -1)
            q0_c = jnp.repeat(roots, len(idx_c), axis=0)
            if cfg.root_kp_idx >= 0 and cfg.do_root_opt:
                root_xyz_c = jax.lax.dynamic_slice(
                    kp_c, (0, 3 * cfg.root_kp_idx), (kp_c.shape[0], 3)
                )
                q0_c = q0_c.at[:, :3].set(root_xyz_c)
            res_c = core.q_opt_batch(
                params,
                kp_c,
                jnp.ones(nq_, dtype=bool),
                jnp.ones(kp_c.shape[1], dtype=kp_c.dtype),
                q0_c,
                lb,
                ub,
            )
            q_coarse = res_c.params.reshape(C, len(idx_c), nq_)
            q0_flat = interp_seeds(core.topo, q_coarse, s_h, Fc).reshape(
                C * Fc, nq_
            )
            fine_iters = cfg.hier_fine_iters if cfg.hier_fine_iters > 0 else 6
        else:
            q0_flat = jnp.repeat(roots, Fc, axis=0)
        _, qposes, xposes, xquats, marker_sites, errors = pose_optimization(
            core, cfg, params, kp_flat, q0_flat, lb, ub, maxiter=fine_iters,
            # Hier seeds carry the nlerp-INTERPOLATED root translation of
            # two solved coarse frames — strictly better than the raw
            # root-keypoint xyz (which sits a site-offset away from the
            # body origin); don't overwrite it.
            root_reseed=not use_hier,
        )
        shape = lambda a: a.reshape(C, Fc, *a.shape[1:])  # noqa: E731
        if not return_full:
            return shape(qposes), shape(errors)
        return (
            shape(qposes),
            shape(xposes),
            shape(xquats),
            shape(marker_sites),
            shape(errors),
        )

    def per_clip(kp_clip):
        q = params.qpos0
        if cfg.do_root_opt and cfg.root_kp_idx >= 0:
            q = root_optimization(core, cfg, params, kp_clip[0], q, lb, ub)
        _, qposes, xposes, xquats, marker_sites, errors = pose_optimization(
            core, cfg, params, kp_clip, q, lb, ub
        )
        if not return_full:
            return qposes, errors
        return qposes, xposes, xquats, marker_sites, errors

    return jax.vmap(per_clip)(batched_kp)
