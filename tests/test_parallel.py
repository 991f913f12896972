"""Multi-device tests on the 8-device virtual CPU mesh.

These cover what the reference cannot (it is single-device by construction):
clip-axis sharding of the IK program and the psum'd distributed m-phase.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from stac_mjx_tpu.models.builder import extract_model
from stac_mjx_tpu.ops.solver import m_opt_closed_form
from stac_mjx_tpu.ops.stac_core import StacCore
from stac_mjx_tpu.parallel.mesh import CLIP_AXIS, clip_mesh, shard_clips

CHAIN_XML = """
<mujoco><worldbody>
  <body name="b1" pos="0 0 0.1">
    <joint name="j1" type="hinge" axis="0 0 1" range="-3 3"/>
    <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
    <site name="s1" pos="0.05 0.01 0"/>
    <body name="b2" pos="0.1 0 0">
      <joint name="j2" type="hinge" axis="0 1 0" range="-3 3"/>
      <geom type="capsule" size=".01" fromto="0 0 0 0.1 0 0"/>
      <site name="s2" pos="0.05 -0.01 0.02"/>
    </body>
  </body>
</worldbody></mujoco>
"""


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_shard_clips_places_on_mesh():
    x = jnp.zeros((8, 5, 6))
    sharded = shard_clips(x)
    assert len(sharded.sharding.device_set) == 8


def test_shard_clips_uneven_falls_back():
    x = jnp.zeros((7, 5, 6))
    sharded = shard_clips(x)
    assert sharded.shape == (7, 5, 6)  # still usable


def test_msolve_psum_matches_unsharded():
    """Sharded m-phase (psum over frame shards) == single-device solve."""
    rng = np.random.default_rng(0)
    T, K = 16, 3
    p = jnp.asarray(rng.normal(size=(T, K, 3)), jnp.float32)
    q_rand = rng.normal(size=(T, K, 4))
    q_rand /= np.linalg.norm(q_rand, axis=-1, keepdims=True)
    from stac_mjx_tpu.ops.quat import quat_to_mat

    R = quat_to_mat(jnp.asarray(q_rand, jnp.float32))
    m_true = jnp.asarray(rng.normal(size=(K, 3)), jnp.float32)
    y = p + jnp.einsum("tkij,kj->tki", R, m_true)
    m0 = jnp.zeros((K, 3))
    d = jnp.zeros((K, 3))

    ref = m_opt_closed_form(p, R, y, m0, d, 0.0)

    mesh = clip_mesh(8)
    fn = shard_map(
        lambda p_, R_, y_: m_opt_closed_form(
            p_, R_, y_, m0, d, 0.0, n_frames_total=T, axis_name=CLIP_AXIS
        ),
        mesh=mesh,
        in_specs=(P(CLIP_AXIS), P(CLIP_AXIS), P(CLIP_AXIS)),
        out_specs=P(),
        check_rep=False,
    )
    out = fn(p, R, y)
    np.testing.assert_allclose(np.array(out.params), np.array(ref.params), atol=1e-5)
    np.testing.assert_allclose(np.array(out.params), np.array(m_true), atol=1e-5)


def test_sharded_ik_matches_single_device():
    """The vmapped clip solve gives identical results sharded vs replicated."""
    m = mujoco.MjModel.from_xml_string(CHAIN_XML)
    topo, params = extract_model(m)
    core = StacCore(topo, np.arange(2), tol=1e-8, n_iter_q=100)
    lb, ub = -3 * jnp.ones(2), 3 * jnp.ones(2)

    rng = np.random.default_rng(1)
    q_true = jnp.asarray(rng.uniform(-1, 1, (8, 4, 2)), jnp.float32)  # clips x frames
    kp = jax.vmap(
        jax.vmap(lambda q: core.fk(params, q).site_xpos.reshape(-1))
    )(q_true)

    def per_clip(kp_clip):
        def step(q_carry, kp_t):
            res = core.q_opt(
                params, kp_t, jnp.ones(2, bool), jnp.ones(6), q_carry, lb, ub
            )
            return res.params, res.params

        _, qs = jax.lax.scan(step, jnp.zeros(2), kp_clip)
        return qs

    solve = jax.jit(jax.vmap(per_clip))
    dense = solve(kp)
    sharded = solve(shard_clips(kp))
    np.testing.assert_allclose(np.array(dense), np.array(sharded), atol=1e-6)
    # secondary: solves actually track the ground truth (loose — 100 PG iters)
    err = np.abs(np.array(dense) - np.array(q_true))
    assert err.mean() < 0.05


def test_ik_only_program_sharded_matches_replicated():
    """The FULL ik_only program (root + lockstep pose) under clip sharding."""
    from stac_mjx_tpu import pipeline
    from stac_mjx_tpu.pipeline import StacConfigStatic

    m = mujoco.MjModel.from_xml_string(CHAIN_XML)
    topo, params = extract_model(m)
    core = StacCore(topo, np.arange(2), tol=1e-10, n_iter_q=40, q_solver="gn-lm")
    lb, ub = -3 * jnp.ones(2), 3 * jnp.ones(2)
    cfg = StacConfigStatic(
        n_iters=1,
        n_sample_frames=2,
        m_reg_coef=0.0,
        root_kp_idx=-1,
        root_dims=7,
        do_root_opt=False,
        indiv_parts=(),
        trunk_kps=np.ones(2, bool),
        pose_mode="lockstep",
    )

    rng = np.random.default_rng(2)
    q_true = jnp.asarray(rng.uniform(-1, 1, (8, 4, 2)), jnp.float32)
    kp = jax.vmap(
        jax.vmap(lambda q: core.fk(params, q).site_xpos.reshape(-1))
    )(q_true)
    offsets = params.site_pos[jnp.asarray(core.site_idxs)]

    fn = jax.jit(
        lambda b: pipeline.ik_only_program(core, cfg, params, b, offsets, lb, ub)
    )
    dense = fn(kp)
    sharded = fn(shard_clips(kp))
    np.testing.assert_allclose(
        np.array(dense[0]), np.array(sharded[0]), atol=1e-6
    )
    # the lockstep GN solves recover the ground-truth poses
    np.testing.assert_allclose(np.array(dense[0]), np.array(q_true), atol=1e-3)


def test_local_clip_range_and_global_assembly():
    from stac_mjx_tpu.parallel.distributed import (
        local_clip_range,
        make_global_clips,
        pod_mesh,
    )

    mesh = pod_mesh()
    start, stop = local_clip_range(16, mesh)
    assert (start, stop) == (0, 16)  # single process owns everything
    with pytest.raises(ValueError, match="do not divide"):
        local_clip_range(9, mesh)

    data = np.arange(16 * 4 * 6, dtype=np.float32).reshape(16, 4, 6)
    garr = make_global_clips(data[start:stop], mesh)
    assert garr.shape == (16, 4, 6)
    assert len(garr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(garr), data)


def test_psum_error_stats_matches_global():
    from stac_mjx_tpu.parallel.distributed import psum_error_stats

    rng = np.random.default_rng(3)
    errs = jnp.asarray(rng.normal(2.0, 0.5, (8, 10)), jnp.float32)
    mesh = clip_mesh(8)
    fn = shard_map(
        lambda e: psum_error_stats(e),
        mesh=mesh,
        in_specs=(P(CLIP_AXIS),),
        out_specs=(P(), P()),
        check_rep=False,
    )
    mean, std = jax.jit(fn)(errs)
    np.testing.assert_allclose(float(mean), float(jnp.mean(errs)), rtol=1e-5)
    np.testing.assert_allclose(float(std), float(jnp.std(errs)), rtol=1e-4)
