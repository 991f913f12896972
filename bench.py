"""Benchmark: rodent fit + IK throughput (frames/s) on the current accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, "detail": {...}}

Workloads (BASELINE.md eval configs):
  * fit_offsets on 250 frames of the reference's rodent recording
    (root opt + 6 alternation iters + final pose pass), throughput config.
  * ik_only on a 10,000-frame multi-clip recording (the 1000-frame rodent
    recording tiled 10x, 40 clips x 250 frames) with the offsets calibrated
    by the fit. This is the headline metric. End-to-end includes host->device
    placement and the D2H result pull (lean payload: qpos + errors); the
    device-only time of the same jitted program is reported alongside.

Throughput config: lockstep scheduling, analytic-Jacobian Levenberg-
Marquardt (ops/gn_ik.py, normal equations through the Pallas batched-
Cholesky kernel), pointer-doubling FK, no per-part refinement. Quality is
reported as mean_marker_resid_m on the 10k workload.

vs_baseline: measured against this framework's own reference-parity
execution mode on the SAME chip — `q_solver=pg-jaxopt pose_mode=sequential`,
the whole-program lax.scan replication of the reference's algorithm
(sequential warm-started frames, 400-iter projected gradient, per-part
refinement; stac_mjx/compute_stac.py:216-267). The reference itself cannot
run here (CUDA/MJX-bound), so this is the honest apples-to-apples ratio:
same math and hardware, reference algorithm vs TPU-native execution. The
reference's *dispatch* style (one jit call per frame per part from Python)
is additionally reported as detail.ref_style_dispatch_fps — it is dominated
by per-call tunnel latency on this box and is NOT used as the baseline.
"""

import json
import os
import sys
import time

import numpy as np


def _fps(n_frames, fn):
    t0 = time.time()
    fn()
    return n_frames / (time.time() - t0)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from stac_mjx_tpu.config import compose_config
    from stac_mjx_tpu import io
    from stac_mjx_tpu.ops.stac_core import make_qs
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset
    from stac_mjx_tpu.utils.batching import batch_kp_data
    from stac_mjx_tpu.utils.xla import enable_xla_flags

    enable_xla_flags()

    # Sizes are overridable for smoke-testing on CPU (defaults = the real
    # benchmark workload; the driver runs the defaults).
    n_fit = int(os.environ.get("STAC_BENCH_FIT_FRAMES", 250))
    clip = int(os.environ.get("STAC_BENCH_CLIP_FRAMES", 250))
    n_ik = int(os.environ.get("STAC_BENCH_IK_FRAMES", 10_000))
    throughput_overrides = [
        f"stac.n_fit_frames={n_fit}",
        f"stac.n_frames_per_clip={clip}",
        "stac.pose_mode=lockstep",
        "stac.q_solver=gn-lm",
        "stac.skip_part_opt=true",
        "stac.fk_impl=jump",
        "stac.ik_return_full=false",
    ]
    cfg = compose_config("/root/repo/configs", overrides=throughput_overrides)
    data_file = resolve_asset(
        "tests/data/test_rodent_mocap_1000_frames.nwb", "/root/repo"
    )
    xml = resolve_asset(cfg.model.MJCF_PATH, "/root/repo")

    if data_file.exists():
        cfg.stac.data_path = str(data_file)
        kp_base, names = io.load_data(cfg, base_path="/root/repo")
        kp_base = np.asarray(kp_base)
    else:
        # Self-contained fallback: synthesize keypoints by FK of random poses.
        names = list(cfg.model.KEYPOINT_MODEL_PAIRS.keys())
        synth = Stac(xml, cfg, names)
        rng = np.random.default_rng(0)
        qs = np.tile(np.asarray(synth.params.qpos0), (1000, 1))
        qs += 0.05 * rng.normal(size=qs.shape)
        kp_base = np.asarray(
            jax.vmap(
                lambda q: synth.stac_core_obj.fk(synth.params, q)
                .site_xpos[synth._body_site_idxs]
                .reshape(-1)
            )(jnp.asarray(qs, jnp.float32))
        )

    kp_ik = np.tile(kp_base, (n_ik // len(kp_base) + 1, 1))[:n_ik]

    stac = Stac(xml, cfg, names)

    # ---- fit_offsets (250 frames, root + 6 iters + final pass) ------------
    kp_fit = jnp.asarray(kp_base[:n_fit], jnp.float32)
    stac.fit_offsets(kp_fit)  # warmup: compiles the fit program
    fit_fps = _fps(n_fit, lambda: stac.fit_offsets(kp_fit))
    offsets = np.asarray(stac._offsets)

    # ---- ik_only end-to-end on 10k frames / 40 clips ----------------------
    ik = stac.ik_only(kp_ik, offsets)  # warmup compile
    ik_e2e_fps = _fps(n_ik, lambda: stac.ik_only(kp_ik, offsets))

    # Device-only split: the same jitted program, synced but not fetched.
    batched = jnp.asarray(
        batch_kp_data(kp_ik, clip, continuous=False), jnp.float32
    )
    offs_dev = jnp.asarray(offsets, jnp.float32)
    ik_fn = stac._get_ik_fn(return_full=False)
    out = ik_fn(stac.params, batched, offs_dev, stac._lb, stac._ub)
    jax.block_until_ready(out)
    ik_dev_fps = _fps(
        n_ik,
        lambda: jax.block_until_ready(
            ik_fn(stac.params, batched, offs_dev, stac._lb, stac._ub)
        ),
    )

    # Quality on the 10k workload: the program's per-frame errors ARE the
    # mean marker Euclidean distance in meters (pipeline.pose_optimization),
    # so quality costs one scalar D2H — a 10k-frame full-output pull
    # (~22 MB) is exactly the tunnel pathology CLAUDE.md warns about.
    resid = float(jnp.mean(out[-1]))

    # ---- baseline: whole-program reference-parity mode --------------------
    # Same chip, same single jitted program discipline, but the reference's
    # algorithm: sequential warm-started frames (lax.scan), 400-iteration
    # jaxopt-semantics projected gradient, per-part refinement passes.
    par_cfg = compose_config(
        "/root/repo/configs",
        overrides=[
            f"stac.n_frames_per_clip={clip}",
            "stac.pose_mode=sequential",
            "stac.q_solver=pg-jaxopt",
            "stac.ik_return_full=false",
        ],
    )
    par = Stac(xml, par_cfg, names)
    kp_par = kp_base[:clip]
    par.ik_only(kp_par, offsets)  # warmup compile
    parity_fps = _fps(clip, lambda: par.ik_only(kp_par, offsets))

    # ---- detail-only: reference *dispatch* style (one jit call per frame
    # per part from Python) — tunnel-latency bound on this box, see module
    # docstring; reported for context, never used as the baseline.
    from stac_mjx_tpu.ops.stac_core import StacCore

    core = StacCore(
        stac.topo,
        stac._body_site_idxs,
        tol=float(cfg.model.FTOL),
        n_iter_q=int(cfg.model.N_ITER_Q),
        q_solver="pg",
    )
    params, lb, ub = stac.params, stac._lb, stac._ub
    nq, K = stac.topo.nq, len(stac._body_site_idxs)
    q_opt = jax.jit(core.q_opt)
    qs_all = jnp.ones(nq, bool)
    kps_all = jnp.ones(K * 3)
    parts = [jnp.asarray(p) for p in stac._indiv_parts]
    kp_dev = jnp.asarray(kp_base, jnp.float32)

    q = params.qpos0
    jax.block_until_ready(q_opt(params, kp_dev[0], qs_all, kps_all, q, lb, ub).params)
    for p in parts:
        jax.block_until_ready(q_opt(params, kp_dev[0], p, kps_all, q, lb, ub).params)

    n_disp = 10

    def _ref_style():
        q = params.qpos0
        for f in range(n_disp):
            res = q_opt(params, kp_dev[f], qs_all, kps_all, q, lb, ub)
            q = res.params
            for p in parts:
                res = q_opt(params, kp_dev[f], p, kps_all, q, lb, ub)
                q = make_qs(q, p, res.params)
        q.block_until_ready()

    dispatch_fps = _fps(n_disp, _ref_style)

    print(
        json.dumps(
            {
                "metric": "rodent_ik10k_frames_per_s_per_chip",
                "value": round(ik_e2e_fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(ik_e2e_fps / parity_fps, 1),
                "detail": {
                    "baseline_parity_mode_fps": round(parity_fps, 2),
                    "baseline_parity_mode": "pg-jaxopt sequential scan, 400 PG iters + part refinement, whole-program",
                    "ik_device_only_fps": round(ik_dev_fps, 2),
                    "e2e_over_device": round(ik_e2e_fps / ik_dev_fps, 3),
                    "fit_offsets_fps": round(fit_fps, 2),
                    "fit_frames": n_fit,
                    "ik_frames": n_ik,
                    "ik_clips": n_ik // clip,
                    "mean_marker_resid_m": round(resid, 6),
                    "ref_style_dispatch_fps": round(dispatch_fps, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
