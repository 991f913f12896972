"""Worker process for the real 2-process distributed test.

Invoked by tests/test_multiprocess.py as:
    python tests/_dist_worker.py <port> <n_procs> <proc_id> <outdir>

Each worker joins the jax.distributed cluster (CPU backend, 2 virtual
devices per process -> a 4-device pod mesh), loads ONLY its slice of the
synthetic recording, and runs the sharded fit (psum'd m-phase) and the
clip-sharded ik through the same library entry points run_stac_distributed
uses. Results are allgathered and dumped so the parent can assert that both
processes agree with each other and with the single-process program.
"""

import os
import sys


def main() -> int:
    port, n_procs, proc_id, outdir = sys.argv[1:5]
    n_procs, proc_id = int(n_procs), int(proc_id)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from stac_mjx_tpu import pipeline
    from stac_mjx_tpu.parallel.distributed import (
        fetch_arrays,
        local_clip_range,
        make_global_clips,
        make_global_frames,
        pod_mesh,
    )
    from stac_mjx_tpu.parallel.mesh import CLIP_AXIS
    from tests._dist_common import build_workload

    F = 8
    core, cfg, params, kp, lb, ub, is_reg = build_workload(F)
    mesh = pod_mesh()
    n_dev = int(mesh.devices.size)
    assert n_dev == 2 * n_procs, f"expected {2 * n_procs} devices, got {n_dev}"

    # --- sharded fit: this process contributes only its frame block -------
    per_proc = F // n_procs
    local_frames = kp[proc_id * per_proc : (proc_id + 1) * per_proc]
    kp_global = make_global_frames(local_frames, mesh)
    fit = pipeline.fit_offsets_sharded(core, cfg, mesh, CLIP_AXIS)
    fit_out = fetch_arrays(jax.jit(fit)(params, kp_global, lb, ub, is_reg))

    # --- clip-sharded ik: local clip block only ---------------------------
    n_clips, clip_len = 4, F // 4
    batched = kp.reshape(n_clips, clip_len, kp.shape[-1])
    lo, hi = local_clip_range(n_clips, mesh)
    ik_global = make_global_clips(np.ascontiguousarray(batched[lo:hi]), mesh)
    offsets = jnp.asarray(fit_out["offsets"])

    def ik(p, k, o):
        return pipeline.ik_only_program(core, cfg, p, k, o, lb, ub)

    qposes, _, _, marker_sites, errors = fetch_arrays(
        jax.jit(ik)(params, ik_global, offsets)
    )

    np.savez(
        os.path.join(outdir, f"proc{proc_id}.npz"),
        offsets=fit_out["offsets"],
        fit_qpos=fit_out["qpos"],
        fit_errors=fit_out["frame_error"],
        ik_qpos=qposes,
        ik_errors=errors,
        clip_range=np.asarray([lo, hi]),
    )
    print(f"worker {proc_id}: ok (clips [{lo},{hi}))", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
