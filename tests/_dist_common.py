"""Shared synthetic workload for the distributed tests.

Used by tests/test_distributed.py (single-process 8-device mesh) and
tests/_dist_worker.py (real 2-process jax.distributed cluster) so both
paths solve the identical problem and can be cross-checked.
"""

from __future__ import annotations

import numpy as np

# Two sites per body (6 sites = 18 observations > 9 DOF): the IK must be
# OVERDETERMINED, otherwise the q-phase fits any keypoints exactly and the
# m-phase never has residual to correct (3 sites x 3 coords == 9 DOF would
# make offset recovery untestable).
CHAIN_XML = """
<mujoco><worldbody>
  <body name="root" pos="0 0 0.3">
    <freejoint/>
    <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
    <site name="s0" pos="0.02 0.01 0.03"/>
    <site name="s0b" pos="-0.01 0.04 -0.02"/>
    <body name="b1" pos="0.1 0 0">
      <joint name="j1" type="hinge" axis="0 0 1" range="-3 3"/>
      <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
      <site name="s1" pos="0.05 0.01 0"/>
      <site name="s1b" pos="0.03 -0.03 0.02"/>
      <body name="b2" pos="0.1 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-3 3"/>
        <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
        <site name="s2" pos="0.05 -0.01 0.02"/>
        <site name="s2b" pos="0.08 0.02 -0.01"/>
      </body>
    </body>
  </body>
</worldbody></mujoco>
"""

N_SITES = 6
# Per-site DISTINCT shifts: a shift that is constant across sites is gauge-
# equivalent to a root translation at near-identity poses and the q-phase
# absorbs it — distinct shifts force the m-phase to do the work.
TRUE_SHIFT = np.asarray(
    [
        [0.004, -0.003, 0.002],
        [-0.003, 0.005, -0.002],
        [0.002, 0.002, 0.004],
        [-0.004, -0.002, 0.003],
        [0.005, 0.001, -0.003],
        [-0.002, 0.004, 0.001],
    ],
    np.float32,
)


def build_workload(n_frames: int, n_iters: int = 3, seed: int = 7):
    """(core, cfg, params, kp (F,K*3) np, lb, ub, is_reg) for the chain."""
    import jax
    import jax.numpy as jnp
    import mujoco

    from stac_mjx_tpu import pipeline
    from stac_mjx_tpu.models.builder import extract_model
    from stac_mjx_tpu.ops.stac_core import StacCore

    m = mujoco.MjModel.from_xml_string(CHAIN_XML)
    topo, params = extract_model(m)
    core = StacCore(
        topo, np.arange(N_SITES), tol=1e-10, n_iter_q=60, q_solver="gn-lm"
    )
    lb = np.full(topo.nq, -3.0, np.float32)
    ub = np.full(topo.nq, 3.0, np.float32)
    lb[:3], ub[:3] = -1.0, 1.0
    lb[3:7], ub[3:7] = -1.0, 1.0

    rng = np.random.default_rng(seed)
    qs = np.tile(np.asarray(params.qpos0, np.float32), (n_frames, 1))
    qs[:, 7:] += 0.3 * rng.normal(size=(n_frames, topo.nq - 7)).astype(
        np.float32
    )
    shifted = params.set_site_pos(
        params.site_pos[np.arange(N_SITES)] + TRUE_SHIFT, jnp.arange(N_SITES)
    )
    kp = jax.vmap(
        lambda q: core.fk(shifted, q).site_xpos[np.arange(N_SITES)].reshape(-1)
    )(jnp.asarray(qs))

    cfg = pipeline.StacConfigStatic(
        n_iters=n_iters,
        n_sample_frames=n_frames,  # all frames: sampling-divergence free
        m_reg_coef=0.0,
        root_kp_idx=-1,
        root_dims=7,
        do_root_opt=False,
        indiv_parts=(),
        trunk_kps=np.ones(N_SITES, bool),
        pose_mode="lockstep",
    )
    is_reg = jnp.zeros((N_SITES, 3), jnp.float32)
    return (
        core,
        cfg,
        params,
        np.asarray(kp),
        jnp.asarray(lb),
        jnp.asarray(ub),
        is_reg,
    )
