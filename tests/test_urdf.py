"""Native URDF loader tests (native/urdf_loader.cpp via crocoddyl_tpu.io).

Mirrors how the reference obtains models: pinocchio::urdf::buildModel (C++)
producing joint placements, composited inertias (fixed joints merged) and
URDF limits (multibody.hxx:25-35).  We check the flattened model against a
hand-built ModelBuilder twin and against dynamics invariants.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics.model import JointType, ModelBuilder
from crocoddyl_tpu.io import load_urdf_string

ARM_URDF = """<?xml version="1.0"?>
<robot name="arm2">
  <link name="base">
    <inertial>
      <mass value="4.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="upper">
    <inertial>
      <origin xyz="0 0 -0.2" rpy="0 0 0"/>
      <mass value="2.0"/>
      <inertia ixx="0.03" iyy="0.03" izz="0.005" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="fore">
    <inertial>
      <origin xyz="0 0 -0.15"/>
      <mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="hand"/>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 0.5" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" velocity="5.0" effort="40.0"/>
  </joint>
  <joint name="elbow" type="continuous">
    <parent link="upper"/>
    <child link="fore"/>
    <origin xyz="0 0 -0.4"/>
    <axis xyz="0 1 0"/>
    <limit velocity="8.0" effort="20.0"/>
  </joint>
  <joint name="wrist_weld" type="fixed">
    <parent link="fore"/>
    <child link="hand"/>
    <origin xyz="0 0 -0.3" rpy="0 0 1.1"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def arm():
    return load_urdf_string(ARM_URDF, floating_base=False)


def test_structure(arm):
    assert arm.joint_names == ("shoulder", "elbow")
    assert arm.joint_types == (int(JointType.REVOLUTE),) * 2
    assert arm.parents == (-1, 0)
    assert arm.nq == 2 and arm.nv == 2
    # links become operational frames (fixed child merged into 'elbow' body)
    assert set(arm.frame_names) >= {"upper", "fore", "hand"}
    f = arm.frame_id("hand")
    assert arm.frame_parents[f] == 1
    np.testing.assert_allclose(np.asarray(arm.fp_p[f]), [0, 0, -0.3],
                               atol=1e-12)


def test_limits(arm):
    np.testing.assert_allclose(np.asarray(arm.q_lb), [-2.0, -np.inf])
    np.testing.assert_allclose(np.asarray(arm.q_ub), [2.0, np.inf])
    np.testing.assert_allclose(np.asarray(arm.v_limit), [5.0, 8.0])
    np.testing.assert_allclose(np.asarray(arm.effort_limit), [40.0, 20.0])


def test_matches_hand_built_model(arm):
    """FK + mass matrix + gravity torques agree with a ModelBuilder twin
    (fixed 'hand' link contributes no inertia, so dynamics must match the
    2-body model exactly)."""
    b = ModelBuilder()
    j0 = b.add_joint(JointType.REVOLUTE, -1, "shoulder",
                     placement_p=np.array([0, 0, 0.5]), axis=(0, 1, 0),
                     mass=2.0, com=(0, 0, -0.2),
                     inertia=np.diag([0.03, 0.03, 0.005]),
                     q_lim=(-2, 2), v_lim=5.0, effort_lim=40.0)
    j1 = b.add_joint(JointType.REVOLUTE, j0, "elbow",
                     placement_p=np.array([0, 0, -0.4]), axis=(0, 1, 0),
                     mass=1.0, com=(0, 0, -0.15),
                     inertia=np.diag([0.01, 0.01, 0.002]),
                     v_lim=8.0, effort_lim=20.0)
    b.add_frame("hand", j1, placement_p=np.array([0, 0, -0.3]))
    twin = b.build()

    q = jnp.asarray([0.3, -0.7])
    v = jnp.asarray([0.2, 0.5])

    oMi_a, _ = algo.forward_kinematics(arm, q)
    oMi_t, _ = algo.forward_kinematics(twin, q)
    np.testing.assert_allclose(np.asarray(oMi_a.p), np.asarray(oMi_t.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(oMi_a.R), np.asarray(oMi_t.R),
                               atol=1e-12)

    Ma = algo.crba(arm, q)
    Mt = algo.crba(twin, q)
    np.testing.assert_allclose(np.asarray(Ma), np.asarray(Mt), atol=1e-12)

    tau_a = algo.rnea(arm, q, v, jnp.zeros(2))
    tau_t = algo.rnea(twin, q, v, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(tau_a), np.asarray(tau_t),
                               atol=1e-12)

    hand_a = algo.frame_placement(arm, oMi_a, arm.frame_id("hand"))
    hand_t = algo.frame_placement(twin, oMi_t, twin.frame_id("hand"))
    np.testing.assert_allclose(np.asarray(hand_a.p), np.asarray(hand_t.p),
                               atol=1e-12)


def test_fixed_joint_inertia_composition():
    """A body split across a fixed joint composites into one rigid body:
    dynamics equal the pre-merged equivalent."""
    split = """<robot name="s">
      <link name="root"><inertial><mass value="1.0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01"/></inertial></link>
      <link name="a"><inertial><origin xyz="0.1 0 0"/><mass value="2.0"/>
        <inertia ixx="0.02" iyy="0.03" izz="0.04"/></inertial></link>
      <link name="b"><inertial><origin xyz="0.0 0.2 0"/><mass value="3.0"/>
        <inertia ixx="0.05" iyy="0.02" izz="0.03"/></inertial></link>
      <joint name="j" type="revolute">
        <parent link="root"/><child link="a"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1" velocity="1" effort="1"/>
      </joint>
      <joint name="weld" type="fixed">
        <parent link="a"/><child link="b"/>
        <origin xyz="0.3 0 0" rpy="0 0 0.7"/>
      </joint>
    </robot>"""
    m = load_urdf_string(split, floating_base=False)
    assert m.njoints == 1
    # total mass of the moving body = 2 + 3
    np.testing.assert_allclose(float(m.mass[0]), 5.0, atol=1e-12)
    # com = mass-weighted: a at (0.1,0,0); b at (0.3,0,0) + Rz(0.7)@(0,0.2,0)
    Rz = np.array([[np.cos(0.7), -np.sin(0.7), 0],
                   [np.sin(0.7), np.cos(0.7), 0], [0, 0, 1]])
    com_b = np.array([0.3, 0, 0]) + Rz @ np.array([0, 0.2, 0])
    com = (2.0 * np.array([0.1, 0, 0]) + 3.0 * com_b) / 5.0
    np.testing.assert_allclose(np.asarray(m.com[0]), com, atol=1e-12)
    # gravity torque equals the composite-body RNEA at q=0
    tau = algo.rnea(m, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
    # torque about z from gravity (-z): r x F has no z-component -> 0
    np.testing.assert_allclose(np.asarray(tau), [0.0], atol=1e-10)


def test_floating_base():
    quad = """<robot name="q">
      <link name="trunk"><inertial><mass value="10.0"/>
        <inertia ixx="0.5" iyy="0.5" izz="0.5"/></inertial></link>
      <link name="leg"><inertial><origin xyz="0 0 -0.1"/><mass value="1.0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01"/></inertial></link>
      <joint name="hip" type="revolute">
        <parent link="trunk"/><child link="leg"/>
        <origin xyz="0.2 0.1 0"/><axis xyz="0 1 0"/>
        <limit lower="-1.5" upper="1.5" velocity="10" effort="30"/>
      </joint>
    </robot>"""
    m = load_urdf_string(quad, floating_base=True)
    assert m.joint_types[0] == int(JointType.FREE_FLYER)
    assert m.nq == 7 + 1 and m.nv == 6 + 1
    # free-flyer position limits are +-inf (multibody.hxx:25-35)
    assert np.all(np.isinf(np.asarray(m.q_lb[:7])))
    # trunk inertia rides on the free-flyer body
    np.testing.assert_allclose(float(m.mass[0]), 10.0)
    np.testing.assert_allclose(float(m.mass[1]), 1.0)
    # ABA under gravity with zero torque: base falls at g
    q = m.neutral()
    a = algo.aba(m, q, jnp.zeros(7), jnp.zeros(7))
    np.testing.assert_allclose(float(a[2]), -9.81, atol=1e-9)
