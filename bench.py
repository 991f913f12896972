"""Benchmark: rodent fit + IK throughput (frames/s) on the current accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, "detail": {...}}

Crash containment (VERDICT r2 #1): every leg runs in its OWN SUBPROCESS with
a timeout, so a TPU-worker kernel fault in one leg (round 2 lost all numbers
to one in the parity warmup) costs only that leg — the orchestrator still
prints the headline JSON, reporting dead legs as null in `detail`. Legs:

  * fit    — fit_offsets on 250 frames of the reference's rodent recording
             (root opt + 6 alternation iters + final pose pass), throughput
             config; persists the calibrated offsets for the other legs.
  * ik     — the HEADLINE: ik_only on a 10,000-frame multi-clip recording
             (40 clips x 250 frames) with the fitted offsets. End-to-end
             includes host->device placement and the lean D2H pull
             (qpos + errors); the device-only time of the same jitted
             program is reported alongside.
  * parity — the baseline: this framework's reference-parity execution mode
             on the SAME chip (`q_solver=pg-jaxopt pose_mode=sequential`,
             the whole-program lax.scan replication of the reference's
             algorithm: sequential warm-started frames, 400-iter projected
             gradient, per-part refinement; stac_mjx/compute_stac.py:216-267).
             Measured at the reference's execution shape (vmap over clips x
             scan within clip) with 10-frame chains — single executions with
             minutes-long sequential chains kill this box's tunnel-attached
             worker (the 250-frame round-2 version did; 25-frame chains
             still do) — and extrapolated to the headline workload's
             250-frame clips (see leg_parity docstring for why that is
             sound). The reference itself cannot run here (CUDA/MJX-bound),
             so this is the honest apples-to-apples ratio: same math and
             hardware, reference algorithm vs TPU-native execution.
  * dispatch — detail-only: the reference's *dispatch* style (one jit call
             per frame per part from Python). Dominated by per-call tunnel
             latency on this box; reported for context, never the baseline.

Throughput config: lockstep scheduling, analytic-Jacobian Levenberg-
Marquardt (ops/gn_ik.py, normal equations through the Pallas batched-
Cholesky kernel), pointer-doubling FK, no per-part refinement. Quality is
reported as mean_marker_resid_m on the 10k workload.

`python bench.py --scaling` runs the separate weak-scaling harness
(bench_scaling.py) instead; see BASELINE.md's multi-host north star.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

LEG_PREFIX = "BENCH_LEG_JSON: "

# Sizes are overridable for smoke-testing on CPU (defaults = the real
# benchmark workload; the driver runs the defaults).
N_FIT = int(os.environ.get("STAC_BENCH_FIT_FRAMES", 250))
CLIP = int(os.environ.get("STAC_BENCH_CLIP_FRAMES", 250))
N_IK = int(os.environ.get("STAC_BENCH_IK_FRAMES", 10_000))
N_PARITY = int(os.environ.get("STAC_BENCH_PARITY_FRAMES", 80))
PARITY_CLIP = int(os.environ.get("STAC_BENCH_PARITY_CLIP", 10))
LEG_TIMEOUT_S = int(os.environ.get("STAC_BENCH_LEG_TIMEOUT", 1500))


def _fps(n_frames, fn):
    t0 = time.time()
    fn()
    return n_frames / (time.time() - t0)


# --------------------------------------------------------------- leg setup


def _setup():
    """Shared leg setup: config, model, keypoint data. Returns a namespace."""
    import jax
    import numpy as np

    from stac_mjx_tpu.config import compose_config
    from stac_mjx_tpu import io
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset
    from stac_mjx_tpu.utils.xla import enable_xla_flags

    enable_xla_flags()

    throughput_overrides = [
        f"stac.n_fit_frames={N_FIT}",
        f"stac.n_frames_per_clip={CLIP}",
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
        import jax.numpy as jnp

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

    class NS:
        pass

    ns = NS()
    ns.cfg, ns.xml, ns.names, ns.kp_base = cfg, xml, names, kp_base
    ns.Stac, ns.compose_config = Stac, compose_config
    ns.throughput_overrides = throughput_overrides
    return ns


def _load_offsets(state_path, stac):
    """Fitted offsets from the fit leg, else the model's initial site offsets.

    Timing of the fixed-budget solvers barely depends on offset values; the
    fallback keeps the ik/parity legs alive when the fit leg died (the
    reported resid is then pessimistic and flagged in the leg JSON).
    """
    import numpy as np

    if state_path and os.path.exists(state_path):
        return np.load(state_path)["offsets"], True
    return np.asarray(stac._offsets), False


# --------------------------------------------------------------------- legs


def leg_fit(state_path):
    import jax.numpy as jnp
    import numpy as np

    ns = _setup()
    stac = ns.Stac(ns.xml, ns.cfg, ns.names)
    kp_fit = jnp.asarray(ns.kp_base[:N_FIT], jnp.float32)
    stac.fit_offsets(kp_fit)  # warmup: compiles the fit program
    fit_fps = _fps(N_FIT, lambda: stac.fit_offsets(kp_fit))
    if state_path:
        np.savez(state_path, offsets=np.asarray(stac._offsets))
    return {"fit_offsets_fps": round(fit_fps, 2), "fit_frames": N_FIT}


def leg_ik(state_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stac_mjx_tpu.utils.batching import batch_kp_data

    ns = _setup()
    stac = ns.Stac(ns.xml, ns.cfg, ns.names)
    offsets, fitted = _load_offsets(state_path, stac)
    kp_ik = np.tile(ns.kp_base, (N_IK // len(ns.kp_base) + 1, 1))[:N_IK]

    stac.ik_only(kp_ik, offsets)  # warmup compile
    ik_e2e_fps = _fps(N_IK, lambda: stac.ik_only(kp_ik, offsets))

    # Device-only split: the same jitted program, synced but not fetched.
    batched = jnp.asarray(batch_kp_data(kp_ik, CLIP, continuous=False), jnp.float32)
    offs_dev = jnp.asarray(offsets, jnp.float32)
    ik_fn = stac._get_ik_fn(return_full=False)
    out = ik_fn(stac.params, batched, offs_dev, stac._lb, stac._ub)
    jax.block_until_ready(out)
    ik_dev_fps = _fps(
        N_IK,
        lambda: jax.block_until_ready(
            ik_fn(stac.params, batched, offs_dev, stac._lb, stac._ub)
        ),
    )

    # Quality: the program's per-frame errors ARE the mean marker Euclidean
    # distance in meters (pipeline.pose_optimization), one scalar D2H.
    resid = float(jnp.mean(out[-1]))

    # Detail leg: f16 wire format (stac.wire_dtype=float16) — mean-centered
    # f16 keypoints H2D, f16 qpos D2H; compute stays f32 on device. Halves
    # the wire bytes, which is exactly what binds e2e on this tunnel.
    cfg16 = ns.compose_config(
        "/root/repo/configs",
        overrides=ns.throughput_overrides + ["stac.wire_dtype=float16"],
    )
    if ns.cfg.stac.data_path:
        cfg16.stac.data_path = ns.cfg.stac.data_path
    stac16 = ns.Stac(ns.xml, cfg16, ns.names)
    stac16.ik_only(kp_ik, offsets)  # warmup compile
    wire_fps = _fps(N_IK, lambda: stac16.ik_only(kp_ik, offsets))

    return {
        "ik_e2e_fps": round(ik_e2e_fps, 2),
        "ik_e2e_fps_wire_f16": round(wire_fps, 2),
        "ik_device_only_fps": round(ik_dev_fps, 2),
        "e2e_over_device": round(ik_e2e_fps / ik_dev_fps, 3),
        "e2e_over_device_wire_f16": round(wire_fps / ik_dev_fps, 3),
        "mean_marker_resid_m": round(resid, 6),
        "ik_frames": N_IK,
        "ik_clips": N_IK // CLIP,
        "offsets_from_fit": fitted,
        # e2e is transfer-bound on this box: the lean payload still moves
        # ~2.8 MB H2D + ~3 MB D2H over a ~12 MB/s tunnel (~0.4 s — larger
        # than the whole device solve). The chunked ik pipeline
        # (stac.ik_chunk_clips) already overlaps transfers with compute;
        # on production hosts (PCIe/ICI-attached chips) e2e ≈ device.
        "e2e_note": "tunnel-transfer-bound; chunked pipeline overlaps D2H/H2D with compute",
    }


def leg_parity(state_path, n_frames):
    """Reference-parity whole-program mode, at a survivable chain depth.

    The parity program is scan(sequential frames) vmapped over clips. A
    single program execution whose sequential chain runs for minutes kills
    this box's tunnel-attached TPU worker (measured: 10-frame chains at
    ~3.8 s/frame survive; 25+-frame chains die), so the leg measures the
    reference's exact execution shape — vmap over clips x scan within clip —
    at clip length PARITY_CLIP and extrapolates to the headline workload's
    250-frame clips. The extrapolation is sound because (a) the per-frame
    chain cost is constant inside the scan and (b) vmap width is free here
    (measured: 8 parallel chains run in the same wall time as 1 — the
    sequential chain is latency-bound, which is exactly the architectural
    contrast this benchmark exists to show).
    """
    clip = PARITY_CLIP
    n_frames = max(clip, (n_frames // clip) * clip)
    ns = _setup()
    par_cfg = ns.compose_config(
        "/root/repo/configs",
        overrides=[
            f"stac.n_frames_per_clip={clip}",
            "stac.pose_mode=sequential",
            "stac.q_solver=pg-jaxopt",
            "stac.ik_return_full=false",
        ],
    )
    par = ns.Stac(ns.xml, par_cfg, ns.names)
    offsets, fitted = _load_offsets(state_path, par)
    kp_par = ns.kp_base[:n_frames]
    par.ik_only(kp_par, offsets)  # warmup compile
    t0 = time.time()
    par.ik_only(kp_par, offsets)
    wall = time.time() - t0
    measured_fps = n_frames / wall
    # Per-frame cost of one sequential chain; the headline workload would
    # run 250-frame chains (40 clips vmapped, width free) — its fps is
    # N_IK / (chain_s_per_frame * CLIP).
    chain_s_per_frame = wall / clip
    extrapolated = N_IK / (chain_s_per_frame * CLIP)
    return {
        "baseline_parity_mode_fps": round(extrapolated, 3),
        "parity_measured_fps_at_shape": round(measured_fps, 3),
        "parity_chain_s_per_frame": round(chain_s_per_frame, 3),
        "parity_clip_frames": clip,
        "parity_frames": n_frames,
        "offsets_from_fit": fitted,
    }


def leg_dispatch(state_path):
    """Reference dispatch style: one jit call per frame per part from Python."""
    import jax
    import jax.numpy as jnp

    from stac_mjx_tpu.ops.stac_core import StacCore, make_qs

    ns = _setup()
    stac = ns.Stac(ns.xml, ns.cfg, ns.names)
    core = StacCore(
        stac.topo,
        stac._body_site_idxs,
        tol=float(ns.cfg.model.FTOL),
        n_iter_q=int(ns.cfg.model.N_ITER_Q),
        q_solver="pg",
    )
    params, lb, ub = stac.params, stac._lb, stac._ub
    nq, K = stac.topo.nq, len(stac._body_site_idxs)
    q_opt = jax.jit(core.q_opt)
    qs_all = jnp.ones(nq, bool)
    kps_all = jnp.ones(K * 3)
    parts = [jnp.asarray(p) for p in stac._indiv_parts]
    kp_dev = jnp.asarray(ns.kp_base, jnp.float32)

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

    return {"ref_style_dispatch_fps": round(_fps(n_disp, _ref_style), 3)}


def run_leg(name, args):
    """Leg entry (subprocess side): run it, print the prefixed JSON line."""
    if name == "fit":
        out = leg_fit(args.state)
    elif name == "ik":
        out = leg_ik(args.state)
    elif name == "parity":
        out = leg_parity(args.state, args.frames)
    elif name == "dispatch":
        out = leg_dispatch(args.state)
    else:
        raise SystemExit(f"unknown leg {name}")
    import jax

    out["device"] = str(jax.devices()[0])
    print(LEG_PREFIX + json.dumps(out), flush=True)
    return 0


# ------------------------------------------------------------- orchestrator


def spawn_leg(name, state_path, extra=()):
    """Run one leg in a subprocess; return (dict or None, diagnostic str)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", name,
           "--state", state_path, *extra]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=LEG_TIMEOUT_S
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {LEG_TIMEOUT_S}s"
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(LEG_PREFIX):
            try:
                return json.loads(line[len(LEG_PREFIX):]), "ok"
            except json.JSONDecodeError as e:
                return None, f"bad leg json: {e}"
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return None, f"rc={proc.returncode}: " + " | ".join(tail)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--leg", default=None)
    parser.add_argument("--state", default=None)
    parser.add_argument("--frames", type=int, default=N_PARITY)
    parser.add_argument("--scaling", action="store_true",
                        help="run the weak-scaling harness instead")
    args = parser.parse_args()

    if args.scaling:
        from bench_scaling import main as scaling_main

        return scaling_main()
    if args.leg:
        return run_leg(args.leg, args)

    detail = {}
    notes = {}
    with tempfile.TemporaryDirectory() as td:
        state = os.path.join(td, "bench_state.npz")

        fit, diag = spawn_leg("fit", state)
        if fit is None:  # one retry: compiles are cached, worker restarts
            fit, diag = spawn_leg("fit", state)
        notes["fit"] = diag

        ik, diag = spawn_leg("ik", state)
        if ik is None:
            ik, diag = spawn_leg("ik", state)
        notes["ik"] = diag

        parity, diag = spawn_leg("parity", state, ("--frames", str(N_PARITY)))
        if parity is None:
            # the long sequential-scan program is the crash-prone one —
            # retry at a smaller (still per-frame-rate-valid) size
            parity, diag = spawn_leg(
                "parity",
                state,
                ("--frames", str(max(N_PARITY // 4, PARITY_CLIP))),
            )
        notes["parity"] = diag

        dispatch, diag = spawn_leg("dispatch", state)
        notes["dispatch"] = diag

    for leg in (fit, ik, parity, dispatch):
        if leg:
            detail.update(leg)
    detail["baseline_parity_mode"] = (
        "pg-jaxopt sequential scan, 400 PG iters + part refinement, "
        "whole-program (per-frame rate; see module docstring)"
    )
    detail["leg_status"] = notes

    value = ik.get("ik_e2e_fps") if ik else None
    parity_fps = parity.get("baseline_parity_mode_fps") if parity else None
    vs = (
        round(value / parity_fps, 1)
        if value is not None and parity_fps
        else None
    )
    print(
        json.dumps(
            {
                "metric": "rodent_ik10k_frames_per_s_per_chip",
                "value": value,
                "unit": "frames/s",
                "vs_baseline": vs,
                "detail": detail,
            }
        )
    )
    return 0 if value is not None else 1


if __name__ == "__main__":
    sys.exit(main())
