"""Quaternion math unit tests (oracle: mujoco mju_* functions)."""

import jax.numpy as jnp
import mujoco
import numpy as np

from stac_mjx_tpu.ops import quat as qm


def _rand_quats(n, seed=0, normalize=True):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    if normalize:
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_mul_matches_mujoco():
    q1, q2 = _rand_quats(50, 1), _rand_quats(50, 2)
    ours = np.array(qm.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    for i in range(50):
        ref = np.zeros(4)
        mujoco.mju_mulQuat(ref, q1[i], q2[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-6)


def test_quat_rotate_matches_mujoco():
    q = _rand_quats(50, 3)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(50, 3))
    ours = np.array(qm.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    for i in range(50):
        ref = np.zeros(3)
        mujoco.mju_rotVecQuat(ref, v[i], q[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-6)


def test_quat_to_mat_matches_mujoco():
    q = _rand_quats(20, 5)
    ours = np.array(qm.quat_to_mat(jnp.asarray(q)))
    for i in range(20):
        ref = np.zeros(9)
        mujoco.mju_quat2Mat(ref, q[i])
        np.testing.assert_allclose(ours[i], ref.reshape(3, 3), atol=1e-6)


def test_axis_angle_quat_matches_mujoco():
    rng = np.random.default_rng(6)
    axes = rng.normal(size=(20, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(-3, 3, 20)
    ours = np.array(qm.axis_angle_quat(jnp.asarray(axes), jnp.asarray(angles)))
    for i in range(20):
        ref = np.zeros(4)
        mujoco.mju_axisAngle2Quat(ref, axes[i], angles[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-6)


def test_quat_normalize_degenerate():
    q = jnp.zeros((3, 4))
    out = np.array(qm.quat_normalize(q))
    np.testing.assert_allclose(out, np.tile([1.0, 0, 0, 0], (3, 1)))


def test_quat_conj_diff_roundtrip():
    q1, q2 = _rand_quats(10, 7), _rand_quats(10, 8)
    d = qm.quat_diff(jnp.asarray(q1), jnp.asarray(q2))
    back = np.array(qm.quat_mul(jnp.asarray(q1), d))
    sign = np.sign(np.sum(back * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(back, q2 * sign, atol=1e-5)


def test_quat_to_axisangle_identity_and_wrap():
    # identity -> zeros
    np.testing.assert_allclose(
        np.array(qm.quat_to_axisangle(jnp.array([1.0, 0, 0, 0]))), np.zeros(3)
    )
    # known rotation: 90 deg about z
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    aa = np.array(qm.quat_to_axisangle(jnp.asarray(q)))
    np.testing.assert_allclose(aa, [0, 0, np.pi / 2], atol=1e-6)
    # batched input matches per-element
    qb = _rand_quats(10, 9)
    batched = np.array(qm.quat_to_axisangle(jnp.asarray(qb)))
    single = np.stack(
        [np.array(qm.quat_to_axisangle(jnp.asarray(qq))) for qq in qb]
    )
    np.testing.assert_allclose(batched, single, atol=1e-6)
