"""Rescale tests, mirroring the reference's tests/unit/test_rescale.py
technique: scale a spec and assert field-by-field behavior on the tree.
"""

import mujoco
import numpy as np
import pytest

from stac_mjx_tpu.models.rescale import scale_spec

SCALE_XML = """
<mujoco>
  <worldbody>
    <body name="top" pos="1 0 0">
      <freejoint/>
      <geom name="g_top" type="capsule" size=".05" fromto="0 0 0 .2 0 0"/>
      <body name="child" pos="0.2 0.1 0.3">
        <joint name="j" type="hinge" axis="0 0 1"/>
        <geom name="g_child" type="sphere" size=".04" pos="0.01 0.02 0.03"/>
        <body name="grandchild" pos="0 0 -0.1">
          <geom name="g_gc" type="box" size=".01 .02 .03"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j" gear="5"/>
  </actuator>
  <keyframe>
    <key qpos="0 0 0.7 1 0 0 0 0.3"/>
  </keyframe>
</mujoco>
"""


@pytest.fixture
def spec():
    return mujoco.MjSpec.from_string(SCALE_XML)


def _body(spec, name):
    return spec.body(name)


def test_descendant_positions_scale(spec):
    scaled = scale_spec(spec, 2.0)
    np.testing.assert_allclose(_body(scaled, "child").pos, [0.4, 0.2, 0.6])
    np.testing.assert_allclose(_body(scaled, "grandchild").pos, [0, 0, -0.2])


def test_first_top_level_body_pos_unscaled(spec):
    """Reference quirk: recursion starts below the first top-level body, so
    its own pos stays (stac_mjx/rescale.py:45)."""
    scaled = scale_spec(spec, 2.0)
    np.testing.assert_allclose(_body(scaled, "top").pos, [1, 0, 0])


def test_geoms_scale(spec):
    scaled = scale_spec(spec, 3.0)
    g = _body(scaled, "child").geoms[0]
    np.testing.assert_allclose(g.size[0], 0.12)
    np.testing.assert_allclose(g.pos, [0.03, 0.06, 0.09])
    gc = _body(scaled, "grandchild").geoms[0]
    np.testing.assert_allclose(gc.size, [0.03, 0.06, 0.09])


def test_actuator_gear_scales_quadratically(spec):
    """Muscle cross-section area ~ scale^2 (stac_mjx/rescale.py:38-40)."""
    scaled = scale_spec(spec, 2.0)
    np.testing.assert_allclose(scaled.actuators[0].gear[0], 20.0)


def test_keyframe_z_scales(spec):
    scaled = scale_spec(spec, 0.5)
    np.testing.assert_allclose(scaled.keys[0].qpos[2], 0.35)
    # only the z component scales
    np.testing.assert_allclose(scaled.keys[0].qpos[7], 0.3)


def test_input_spec_untouched(spec):
    before = np.array(_body(spec, "child").pos)
    scale_spec(spec, 2.0)
    np.testing.assert_allclose(_body(spec, "child").pos, before)


def test_scaled_spec_compiles(spec):
    m = scale_spec(spec, 0.9).compile()
    assert m.nbody == 4


def test_identity_scale_roundtrip(spec):
    """scale=1 must leave every scaled field bitwise identical."""
    scaled = scale_spec(spec, 1.0)
    m0 = spec.compile()
    m1 = scaled.compile()
    np.testing.assert_array_equal(m0.body_pos, m1.body_pos)
    np.testing.assert_array_equal(m0.geom_size, m1.geom_size)
    np.testing.assert_array_equal(m0.actuator_gear, m1.actuator_gear)
