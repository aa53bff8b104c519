"""Programmatic robot model zoo.

The reference loads URDFs via example_robot_data (Talos arm, ANYmal/HyQ,
Talos); that package is unavailable here, so equivalent-topology models are
authored directly: same joint structure and comparable inertial scales, used
for tests, examples and benchmarks.
"""

from __future__ import annotations

import numpy as np

from .model import JointType, ModelBuilder, RobotModel


def pendulum(dtype=np.float64) -> RobotModel:
    b = ModelBuilder(dtype=dtype)
    j = b.add_joint(JointType.REVOLUTE, -1, "joint1", axis=(0, 1, 0),
                    mass=1.0, com=(0.0, 0.0, -0.5), inertia=np.diag([0.01, 0.01, 0.01]),
                    effort_lim=20.0)
    b.add_frame("tip", j, placement_p=np.array([0.0, 0.0, -1.0]))
    return b.build()


def double_pendulum(dtype=np.float64) -> RobotModel:
    """Two-link pendulum, comparable to the reference's double_pendulum
    example (examples/double_pendulum.py)."""
    b = ModelBuilder(dtype=dtype)
    j1 = b.add_joint(JointType.REVOLUTE, -1, "joint1", axis=(0, 1, 0),
                     mass=1.0, com=(0.0, 0.0, -0.25),
                     inertia=np.diag([0.02, 0.02, 0.002]), effort_lim=20.0)
    j2 = b.add_joint(JointType.REVOLUTE, j1, "joint2", axis=(0, 1, 0),
                     placement_p=np.array([0.0, 0.0, -0.5]),
                     mass=1.0, com=(0.0, 0.0, -0.25),
                     inertia=np.diag([0.02, 0.02, 0.002]), effort_lim=20.0)
    b.add_frame("tip", j2, placement_p=np.array([0.0, 0.0, -0.5]))
    return b.build()


def cartpole(dtype=np.float64) -> RobotModel:
    b = ModelBuilder(dtype=dtype)
    cart = b.add_joint(JointType.PRISMATIC, -1, "slider", axis=(1, 0, 0),
                       mass=1.0, com=(0, 0, 0), inertia=np.diag([0.1, 0.1, 0.1]))
    pole = b.add_joint(JointType.REVOLUTE, cart, "pole", axis=(0, 1, 0),
                       mass=0.1, com=(0.0, 0.0, 0.5),
                       inertia=np.diag([0.005, 0.005, 0.0005]))
    b.add_frame("pole_tip", pole, placement_p=np.array([0.0, 0.0, 1.0]))
    return b.build()


def arm7(dtype=np.float64) -> RobotModel:
    """7-DoF serial arm with Talos-arm-like alternating axes and scales
    (stand-in for the reference's Talos-arm reaching fixture)."""
    b = ModelBuilder(dtype=dtype)
    axes = [(0, 0, 1), (0, 1, 0), (0, 0, 1), (0, 1, 0),
            (0, 0, 1), (0, 1, 0), (1, 0, 0)]
    lengths = [0.15, 0.15, 0.25, 0.25, 0.15, 0.1, 0.1]
    masses = [2.0, 2.0, 1.5, 1.5, 1.0, 0.8, 0.5]
    parent = -1
    for i, (ax, L, m) in enumerate(zip(axes, lengths, masses)):
        parent = b.add_joint(
            JointType.REVOLUTE, parent, f"joint{i+1}", axis=ax,
            placement_p=np.array([0.0, 0.0, -L if i else 0.0]),
            mass=m, com=(0.0, 0.0, -L / 2),
            inertia=np.diag([m * L * L / 12] * 2 + [m * 0.001]),
            q_lim=(-2.5, 2.5), v_lim=3.0, effort_lim=60.0)
    b.add_frame("gripper", parent, placement_p=np.array([0.0, 0.0, -0.12]))
    return b.build()


def quadruped(dtype=np.float64) -> RobotModel:
    """ANYmal-style quadruped: free-flyer base + 4 legs × (HAA, HFE, KFE).

    nq = 19, nv = 18, matching the ANYmal fixture dimensions used by the
    reference gait benchmarks (benchmark/quadrupedal-gaits-optctrl.cpp).
    """
    b = ModelBuilder(dtype=dtype)
    base = b.add_joint(JointType.FREE_FLYER, -1, "root", mass=16.0,
                       com=(0.0, 0.0, 0.0),
                       inertia=np.diag([0.25, 0.65, 0.65]))
    x, y = 0.36, 0.20
    hip_len, thigh_len, shank_len = 0.08, 0.285, 0.33
    legs = {"LF": (x, y), "RF": (x, -y), "LH": (-x, y), "RH": (-x, -y)}
    for name, (px, py) in legs.items():
        haa = b.add_joint(JointType.REVOLUTE, base, f"{name}_HAA",
                          axis=(1, 0, 0), placement_p=np.array([px, py, 0.0]),
                          mass=1.5, com=(0.0, np.sign(py) * 0.04, 0.0),
                          inertia=np.diag([0.005, 0.005, 0.005]),
                          q_lim=(-0.7, 0.7), v_lim=10.0, effort_lim=40.0)
        hfe = b.add_joint(JointType.REVOLUTE, haa, f"{name}_HFE",
                          axis=(0, 1, 0),
                          placement_p=np.array([0.0, np.sign(py) * hip_len, 0.0]),
                          mass=1.1, com=(0.0, 0.0, -thigh_len / 2),
                          inertia=np.diag([0.01, 0.01, 0.002]),
                          q_lim=(-2.0, 2.0), v_lim=10.0, effort_lim=40.0)
        kfe = b.add_joint(JointType.REVOLUTE, hfe, f"{name}_KFE",
                          axis=(0, 1, 0),
                          placement_p=np.array([0.0, 0.0, -thigh_len]),
                          mass=0.4, com=(0.0, 0.0, -shank_len / 2),
                          inertia=np.diag([0.004, 0.004, 0.0005]),
                          q_lim=(-2.5, 2.5), v_lim=10.0, effort_lim=40.0)
        b.add_frame(f"{name}_FOOT", kfe,
                    placement_p=np.array([0.0, 0.0, -shank_len]))
    return b.build()


def anymal(dtype=np.float64) -> RobotModel:
    """ANYmal B loaded from the vendored URDF (assets/anymal_b.urdf) through
    the native C++ parser — the benchmark robot, mirroring how the reference
    loads ANYmal via example_robot_data + pinocchio::urdf
    (examples/quadrupedal_gaits.py:15).  nq=19, nv=18, total mass ≈ 30 kg."""
    import os
    from ..io.urdf import load_urdf
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "assets", "anymal_b.urdf")
    return load_urdf(path, floating_base=True, dtype=dtype)


def anymal_standing_q(model: RobotModel, dtype=np.float64):
    """The reference's initial stance: example-robot-data's ANYmal
    ``referenceConfigurations['standing']`` (anymal.srdf), the q0 of
    /root/reference/examples/quadrupedal_gaits.py:18 and of every reference
    quadruped golden log.  Vendored as data (13 numbers) so the parity
    harness runs the same problem INSTANCE as the reference recipe:
    base at z=0.4792, HAA ±0.1 outward, front legs (HFE, KFE)=(0.7, −1.0),
    hind legs (−0.7, 1.0).  Leg order here is LF, RF, LH, RH
    (assets/anymal_b.urdf)."""
    import jax.numpy as jnp
    q = np.zeros(model.nq, dtype)
    q[2] = 0.4792
    q[6] = 1.0  # quat w
    legs = {  # (HAA, HFE, KFE) per leg, example-robot-data standing
        "LF": (-0.1, 0.7, -1.0), "RF": (0.1, 0.7, -1.0),
        "LH": (-0.1, -0.7, 1.0), "RH": (0.1, -0.7, 1.0)}
    for i, leg in enumerate(("LF", "RF", "LH", "RH")):
        q[7 + 3 * i: 10 + 3 * i] = legs[leg]
    return jnp.asarray(q)


def quadruped_standing_q(model: RobotModel, height=0.5, dtype=np.float64):
    """A nominal standing configuration (legs bent, feet under hips)."""
    import jax.numpy as jnp
    q = np.zeros(model.nq, dtype)
    q[2] = height
    q[6] = 1.0  # quat w
    for leg in range(4):
        base = 7 + 3 * leg
        hind = leg >= 2
        q[base + 1] = 0.7 if not hind else -0.7   # HFE
        q[base + 2] = -1.2 if not hind else 1.2   # KFE
    return jnp.asarray(q)


def quadrotor(dtype=np.float64) -> RobotModel:
    """Free-flyer quadrotor body (reference examples/quadrotor.py uses hector;
    comparable mass/inertia scales).  Pair with MultiCopterBaseActuation and
    :func:`quadrotor_tau_f`."""
    b = ModelBuilder(dtype=dtype)
    b.add_joint(JointType.FREE_FLYER, -1, "root", mass=1.5,
                com=(0.0, 0.0, 0.0),
                inertia=np.diag([0.0347563, 0.0458929, 0.0977]))
    b.add_frame("base_link", 0)
    return b.build()


def quadrotor_tau_f(d_cog=0.1525, cf=6.6e-5, cm=1e-6, dtype=np.float64):
    """(6, 4) thrust map for an X-configuration quadrotor
    (examples/quadrotor.py:23-27): wrench = tau_f @ u_rotors."""
    return np.array([
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0],
        [0.0, d_cog, 0.0, -d_cog],
        [-d_cog, 0.0, d_cog, 0.0],
        [-cm / cf, cm / cf, -cm / cf, cm / cf],
    ], dtype)


def biped(dtype=np.float64) -> RobotModel:
    """Simplified Talos-like biped lower body: free-flyer + 2 legs × 6 joints.

    nq = 19, nv = 18.  Stand-in for the reference's Talos-legs fixture
    (bipedal_walk examples).
    """
    b = ModelBuilder(dtype=dtype)
    base = b.add_joint(JointType.FREE_FLYER, -1, "root", mass=30.0,
                       com=(0.0, 0.0, 0.1),
                       inertia=np.diag([1.0, 1.0, 0.5]))
    for name, sy in (("left", 1.0), ("right", -1.0)):
        hip_y = 0.09 * sy
        hz = b.add_joint(JointType.REVOLUTE, base, f"{name}_hip_z",
                         axis=(0, 0, 1), placement_p=np.array([0.0, hip_y, -0.1]),
                         mass=1.0, com=(0, 0, 0), inertia=np.diag([0.01] * 3),
                         q_lim=(-0.8, 0.8), effort_lim=100.0)
        hx = b.add_joint(JointType.REVOLUTE, hz, f"{name}_hip_x",
                         axis=(1, 0, 0), mass=1.0, com=(0, 0, 0),
                         inertia=np.diag([0.01] * 3), q_lim=(-0.6, 0.6),
                         effort_lim=100.0)
        hy = b.add_joint(JointType.REVOLUTE, hx, f"{name}_hip_y",
                         axis=(0, 1, 0), mass=3.0, com=(0.0, 0.0, -0.2),
                         inertia=np.diag([0.04, 0.04, 0.01]),
                         q_lim=(-2.0, 0.7), effort_lim=100.0)
        kn = b.add_joint(JointType.REVOLUTE, hy, f"{name}_knee",
                         axis=(0, 1, 0), placement_p=np.array([0.0, 0.0, -0.38]),
                         mass=2.0, com=(0.0, 0.0, -0.19),
                         inertia=np.diag([0.03, 0.03, 0.005]),
                         q_lim=(0.0, 2.6), effort_lim=100.0)
        ay = b.add_joint(JointType.REVOLUTE, kn, f"{name}_ankle_y",
                         axis=(0, 1, 0), placement_p=np.array([0.0, 0.0, -0.38]),
                         mass=0.8, com=(0.0, 0.0, -0.04),
                         inertia=np.diag([0.005] * 3), q_lim=(-1.3, 0.8),
                         effort_lim=100.0)
        ax = b.add_joint(JointType.REVOLUTE, ay, f"{name}_ankle_x",
                         axis=(1, 0, 0), mass=0.6, com=(0.02, 0.0, -0.06),
                         inertia=np.diag([0.003] * 3), q_lim=(-0.5, 0.5),
                         effort_lim=100.0)
        b.add_frame(f"{name}_sole", ax,
                    placement_p=np.array([0.02, 0.0, -0.10]))
    return b.build()


def biped_standing_q(model: RobotModel, height=0.88, dtype=np.float64):
    import jax.numpy as jnp
    q = np.zeros(model.nq, dtype)
    q[2] = height
    q[6] = 1.0
    for leg in range(2):
        base = 7 + 6 * leg
        q[base + 2] = -0.4   # hip_y
        q[base + 3] = 0.8    # knee
        q[base + 4] = -0.4   # ankle_y
    return jnp.asarray(q)

def humanoid(dtype=np.float64) -> RobotModel:
    """Simplified Talos-like humanoid: biped legs + torso + two 4-DoF arms
    (stand-in for the reference's Talos fixture used by
    humanoid_manipulation/taichi examples).  nq = 30, nv = 29."""
    b = ModelBuilder(dtype=dtype)
    base = b.add_joint(JointType.FREE_FLYER, -1, "root", mass=15.0,
                       com=(0.0, 0.0, 0.05),
                       inertia=np.diag([0.4, 0.4, 0.25]))
    # legs (same recipe as biped())
    for name, sy in (("left", 1.0), ("right", -1.0)):
        hip_y = 0.09 * sy
        hz = b.add_joint(JointType.REVOLUTE, base, f"{name}_hip_z",
                         axis=(0, 0, 1), placement_p=np.array([0.0, hip_y, -0.1]),
                         mass=1.0, com=(0, 0, 0), inertia=np.diag([0.01] * 3),
                         q_lim=(-0.8, 0.8), effort_lim=100.0)
        hx = b.add_joint(JointType.REVOLUTE, hz, f"{name}_hip_x",
                         axis=(1, 0, 0), mass=1.0, com=(0, 0, 0),
                         inertia=np.diag([0.01] * 3), q_lim=(-0.6, 0.6),
                         effort_lim=100.0)
        hy = b.add_joint(JointType.REVOLUTE, hx, f"{name}_hip_y",
                         axis=(0, 1, 0), mass=3.0, com=(0.0, 0.0, -0.2),
                         inertia=np.diag([0.04, 0.04, 0.01]),
                         q_lim=(-2.0, 0.7), effort_lim=100.0)
        kn = b.add_joint(JointType.REVOLUTE, hy, f"{name}_knee",
                         axis=(0, 1, 0), placement_p=np.array([0.0, 0.0, -0.38]),
                         mass=2.0, com=(0.0, 0.0, -0.19),
                         inertia=np.diag([0.03, 0.03, 0.005]),
                         q_lim=(0.0, 2.6), effort_lim=100.0)
        ay = b.add_joint(JointType.REVOLUTE, kn, f"{name}_ankle_y",
                         axis=(0, 1, 0), placement_p=np.array([0.0, 0.0, -0.38]),
                         mass=0.8, com=(0.0, 0.0, -0.04),
                         inertia=np.diag([0.005] * 3), q_lim=(-1.3, 0.8),
                         effort_lim=100.0)
        ax = b.add_joint(JointType.REVOLUTE, ay, f"{name}_ankle_x",
                         axis=(1, 0, 0), mass=0.6, com=(0.02, 0.0, -0.06),
                         inertia=np.diag([0.003] * 3), q_lim=(-0.5, 0.5),
                         effort_lim=100.0)
        b.add_frame(f"{name}_sole", ax,
                    placement_p=np.array([0.02, 0.0, -0.10]))
    # torso
    torso = b.add_joint(JointType.REVOLUTE, base, "torso_z", axis=(0, 0, 1),
                        placement_p=np.array([0.0, 0.0, 0.15]),
                        mass=8.0, com=(0.0, 0.0, 0.15),
                        inertia=np.diag([0.2, 0.2, 0.1]), q_lim=(-1.2, 1.2),
                        effort_lim=100.0)
    # arms: shoulder y/x/z + elbow
    for name, sy in (("left", 1.0), ("right", -1.0)):
        sh_y = 0.2 * sy
        s1 = b.add_joint(JointType.REVOLUTE, torso, f"{name}_shoulder_y",
                         axis=(0, 1, 0), placement_p=np.array([0.0, sh_y, 0.3]),
                         mass=1.0, com=(0.0, 0.0, -0.1),
                         inertia=np.diag([0.01] * 3), q_lim=(-2.5, 2.5),
                         effort_lim=50.0)
        s2 = b.add_joint(JointType.REVOLUTE, s1, f"{name}_shoulder_x",
                         axis=(1, 0, 0), mass=0.8, com=(0.0, 0.0, -0.1),
                         inertia=np.diag([0.008] * 3), q_lim=(-2.0, 2.0),
                         effort_lim=50.0)
        s3 = b.add_joint(JointType.REVOLUTE, s2, f"{name}_shoulder_z",
                         axis=(0, 0, 1), placement_p=np.array([0.0, 0.0, -0.15]),
                         mass=0.8, com=(0.0, 0.0, -0.08),
                         inertia=np.diag([0.006] * 3), q_lim=(-2.0, 2.0),
                         effort_lim=50.0)
        el = b.add_joint(JointType.REVOLUTE, s3, f"{name}_elbow",
                         axis=(0, 1, 0), placement_p=np.array([0.0, 0.0, -0.15]),
                         mass=0.6, com=(0.0, 0.0, -0.12),
                         inertia=np.diag([0.005] * 3), q_lim=(-2.3, 0.1),
                         effort_lim=50.0)
        b.add_frame(f"{name}_gripper", el,
                    placement_p=np.array([0.0, 0.0, -0.25]))
    return b.build()


def humanoid_standing_q(model: RobotModel, height=0.88, dtype=np.float64):
    import jax.numpy as jnp
    q = np.zeros(model.nq, dtype)
    q[2] = height
    q[6] = 1.0
    for leg in range(2):
        base = 7 + 6 * leg
        q[base + 2] = -0.4
        q[base + 3] = 0.8
        q[base + 4] = -0.4
    # arms slightly bent (indices: 7+12 torso, then 2 arms x 4)
    for arm in range(2):
        base = 7 + 12 + 1 + 4 * arm
        q[base + 3] = -0.8  # elbow
    return jnp.asarray(q)
