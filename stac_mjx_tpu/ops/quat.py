"""Batched quaternion math for the TPU-native FK core.

All functions are pure jnp, support arbitrary leading batch dimensions, and are
written to be autodiff-safe (no NaN gradients through conditional branches).

Conventions follow MuJoCo: quaternions are [w, x, y, z], rotations are active,
``quat_rotate(q, v) = R(q) @ v``.

Semantics mirror the reference's quaternion helpers (stac_mjx/utils.py:177-299)
but are vectorized over leading batch axes instead of per-element Python code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# MuJoCo's mjMINVAL, used by mju_normalize4 to guard degenerate quaternions.
_MJ_MINVAL = 1e-15
# Tolerance used when converting quaternions to axis-angle near the identity.
_TOL = 1e-10


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 with arbitrary leading batch dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate [w, -x, -y, -z]."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_diff(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Quaternion taking ``source`` to ``target``: conj(source) * target."""
    return quat_mul(quat_conj(source), target)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (active rotation).

    Uses the expanded 15-multiply form rather than building the rotation
    matrix; fuses well under XLA.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q."""
    return quat_rotate(quat_conj(q), v)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize with MuJoCo mju_normalize4 semantics.

    If the norm is below mjMINVAL the result is the unit quaternion
    [1, 0, 0, 0]. Gradient-safe: the degenerate branch does not propagate
    NaNs through the division.
    """
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    bad = norm2 < _MJ_MINVAL * _MJ_MINVAL
    safe_norm = jnp.sqrt(jnp.where(bad, 1.0, norm2))
    unit = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(bad, unit, q / safe_norm)


def axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from (unit) axis and angle, batched.

    axis: (..., 3), angle: (...,) -> (..., 4). Mirrors mju_axisAngle2Quat.
    """
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from quaternion, batched: (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_to_axisangle(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternion(s) to axis-angle with angle encoded as length.

    Batched, branchless equivalent of the reference's scalar
    ``quat_to_axisangle`` (stac_mjx/utils.py:276-299): angle = 2*acos(w)
    wrapped to (-pi, pi], axis from the vector part. Near-identity rotations
    return zeros. Exactly-pi rotations keep angle = +pi — the reference
    wraps only angle > pi strictly, so a modulo wrap (which sends pi to -pi)
    would diverge from it at that edge.
    """
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    small = angle < _TOL
    qn = jnp.sin(angle / 2.0)
    safe_qn = jnp.where(small, 1.0, qn)
    wrapped = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    axis = quat[..., 1:4] / safe_qn[..., None]
    out = axis * wrapped[..., None]
    return jnp.where(small[..., None], jnp.zeros_like(out), out)
