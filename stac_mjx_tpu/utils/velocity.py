"""Velocity inference from fitted qpos trajectories — fully vectorized.

The reference computes free-joint angular velocities in a per-frame Python
loop (stac_mjx/utils.py:333-340); here the quaternion finite difference is
batched over the whole trajectory with the vectorized quat ops, so the
computation jits and vmaps over clips with no Python iteration.
"""

from __future__ import annotations

import jax.numpy as jnp

from stac_mjx_tpu.ops import quat as qm


def compute_velocity_from_kinematics(
    qpos_trajectory: jnp.ndarray,
    dt: float,
    freejoint: bool = True,
    max_qvel: float = 20.0,
) -> jnp.ndarray:
    """Finite-difference qvel from a qpos trajectory.

    Semantics parity with the reference (stac_mjx/utils.py:302-347): the last
    frame is repeated so output length equals input length; with a free joint
    the first 6 qvel dims are root translation + angular velocity (from the
    normalized quaternion difference via axis-angle), and only the joint dims
    are clipped to +-max_qvel.
    """
    q = jnp.concatenate([qpos_trajectory, qpos_trajectory[-1:]], axis=0)

    if not freejoint:
        qvel = (q[1:] - q[:-1]) / dt
        return jnp.clip(qvel, -max_qvel, max_qvel)

    qvel_joints = (q[1:, 7:] - q[:-1, 7:]) / dt
    qvel_translation = (q[1:, :3] - q[:-1, :3]) / dt

    diff = qm.quat_diff(q[:-1, 3:7], q[1:, 3:7])
    diff = diff / jnp.linalg.norm(diff, axis=-1, keepdims=True)
    qvel_gyro = qm.quat_to_axisangle(diff) / dt

    qvels = jnp.concatenate([qvel_translation, qvel_gyro, qvel_joints], axis=1)
    clipped = jnp.clip(qvels[:, 6:], -max_qvel, max_qvel)
    return qvels.at[:, 6:].set(clipped)
