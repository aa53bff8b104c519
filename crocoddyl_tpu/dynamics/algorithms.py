"""Rigid-body dynamics algorithms — the Pinocchio-algorithm replacement.

Implements, over :class:`RobotModel` kinematic trees (textbook Featherstone
recursions, written for XLA: static unrolled joint loops, einsum-based
spatial ops, batch via ``jax.vmap``):

  - forward kinematics (placements + velocities)
  - RNEA inverse dynamics (→ bias forces, gravity torques)
  - CRBA joint-space inertia matrix
  - ABA forward dynamics
  - frame placements / velocities / Jacobians
  - center of mass + Jacobian

These replace pinocchio::{forwardKinematics, rnea, crba, aba,
computeAllTerms, getFrameJacobian, centerOfMass} used throughout the
reference's multibody layer (e.g. free-fwddyn.hxx:62-74, contact-fwddyn.hxx:
77-99).  Functions take a single (q, v) — batch with vmap.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import lie
from .model import JointType, RobotModel
from .spatial import Inertia, Transform, cross_force, cross_motion, skew


# ---------------------------------------------------------------------------
# Per-joint kinematics
# ---------------------------------------------------------------------------

def _joint_transform_and_motion(model: RobotModel, jid: int, qj, vj_dof):
    """Joint transform X_J (child joint frame in pre-joint frame), motion
    subspace S (6, nvj), and joint velocity vJ = S·q̇ (child frame)."""
    jt = JointType(model.joint_types[jid])
    dt = model.jp_p.dtype
    if jt == JointType.FREE_FLYER:
        p, quat = qj[:3], qj[3:]
        R = lie.quat_to_rot(quat)
        S = jnp.eye(6, dtype=dt)
        vJ = vj_dof
        return Transform(R, p), S, vJ
    axis = model.axis[jid]
    if jt == JointType.REVOLUTE:
        R = lie.exp3(axis * qj[0])
        S = jnp.concatenate([jnp.zeros((3,), dt), axis])[:, None]
        vJ = S[:, 0] * vj_dof[0]
        return Transform(R, jnp.zeros((3,), dt)), S, vJ
    # prismatic
    S = jnp.concatenate([axis, jnp.zeros((3,), dt)])[:, None]
    vJ = S[:, 0] * vj_dof[0]
    return Transform(jnp.eye(3, dtype=dt), axis * qj[0]), S, vJ


def _split(model: RobotModel, q, v):
    qs = [q[i:i + n] for (i, n) in model.q_slices()]
    vs = [v[i:i + n] for (i, n) in model.v_slices()]
    return qs, vs


def _joint_setup(model: RobotModel, q, v):
    """Per-joint local transforms (parent→joint), S, vJ."""
    qs, vs = _split(model, q, v)
    Xup: List[Transform] = []       # joint i frame ← parent joint frame
    Xpl: List[Transform] = []       # parent joint frame ← joint i frame
    Ss, vJs = [], []
    for i in range(model.njoints):
        XJ, S, vJ = _joint_transform_and_motion(model, i, qs[i], vs[i])
        Xtree = Transform(model.jp_R[i], model.jp_p[i])
        Xp = Xtree.compose(XJ)
        Xpl.append(Xp)
        Xup.append(Xp.inverse())
        Ss.append(S)
        vJs.append(vJ)
    return Xpl, Xup, Ss, vJs


def _body_inertia(model: RobotModel, i: int) -> Inertia:
    return Inertia(m=model.mass[i], c=model.com[i], I_c=model.inertia[i])


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------

def forward_kinematics(model: RobotModel, q, v=None):
    """Returns (oMi list of world placements, body-frame velocities list)."""
    if v is None:
        v = jnp.zeros((model.nv,), q.dtype)
    Xpl, Xup, Ss, vJs = _joint_setup(model, q, v)
    oMi: List[Transform] = []
    vels: List[jnp.ndarray] = []
    for i in range(model.njoints):
        p = model.parents[i]
        if p == -1:
            oMi.append(Xpl[i])
            vels.append(vJs[i])
        else:
            oMi.append(oMi[p].compose(Xpl[i]))
            vels.append(Xup[i].act_motion(vels[p]) + vJs[i])
    return oMi, vels


def frame_placement(model: RobotModel, oMi: List[Transform], fid: int) -> Transform:
    j = model.frame_parents[fid]
    return oMi[j].compose(Transform(model.fp_R[fid], model.fp_p[fid]))


def frame_velocity(model: RobotModel, vels, fid: int) -> jnp.ndarray:
    """Frame spatial velocity in the LOCAL frame."""
    j = model.frame_parents[fid]
    fX = Transform(model.fp_R[fid], model.fp_p[fid])
    return fX.inverse().act_motion(vels[j])


def _ancestors(model: RobotModel, jid: int) -> List[int]:
    out = []
    while jid != -1:
        out.append(jid)
        jid = model.parents[jid]
    return out[::-1]


def joint_jacobian_world(model: RobotModel, oMi, Ss, jid: int) -> jnp.ndarray:
    """(6, nv) Jacobian of joint jid's spatial velocity expressed in WORLD."""
    dt = model.jp_p.dtype
    nv = model.nv
    J = jnp.zeros((6, nv), dt)
    vsl = model.v_slices()
    for j in _ancestors(model, jid):
        i0, n = vsl[j]
        # world motion matrix applied to S_j columns
        cols = jax.vmap(oMi[j].act_motion, in_axes=1, out_axes=1)(Ss[j])
        J = J.at[:, i0:i0 + n].set(cols)
    return J


def frame_jacobian(model: RobotModel, q, fid: int,
                   reference_frame: str = "local") -> jnp.ndarray:
    """(6, nv) frame Jacobian; 'local', 'world', or 'local_world_aligned'."""
    v = jnp.zeros((model.nv,), q.dtype)
    Xpl, Xup, Ss, vJs = _joint_setup(model, q, v)
    oMi, _ = forward_kinematics(model, q, v)
    Jw = joint_jacobian_world(model, oMi, Ss, model.frame_parents[fid])
    oMf = frame_placement(model, oMi, fid)
    if reference_frame == "world":
        return Jw
    inv = oMf.inverse()
    Jl = jax.vmap(inv.act_motion, in_axes=1, out_axes=1)(Jw)
    if reference_frame == "local":
        return Jl
    # local_world_aligned: rotate local back to world axes (zero translation)
    Ralign = Transform(oMf.R, jnp.zeros((3,), q.dtype))
    return jax.vmap(Ralign.act_motion, in_axes=1, out_axes=1)(Jl)


# ---------------------------------------------------------------------------
# RNEA — inverse dynamics: tau = M(q)·a + b(q, v) − tau_ext
# ---------------------------------------------------------------------------

def rnea(model: RobotModel, q, v, a, fext: Optional[jnp.ndarray] = None):
    """fext: optional (njoints, 6) external forces in each JOINT-LOCAL frame."""
    dt = q.dtype
    Xpl, Xup, Ss, vJs = _joint_setup(model, q, v)
    vsl = model.v_slices()
    g_spatial = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros((3,), dt)])

    vel: List[jnp.ndarray] = [None] * model.njoints
    acc: List[jnp.ndarray] = [None] * model.njoints
    f: List[jnp.ndarray] = [None] * model.njoints
    for i in range(model.njoints):
        p = model.parents[i]
        i0, n = vsl[i]
        ai_j = Ss[i] @ a[i0:i0 + n]
        if p == -1:
            vel[i] = vJs[i]
            acc[i] = Xup[i].act_motion(g_spatial) + ai_j + cross_motion(vel[i], vJs[i])
        else:
            vel[i] = Xup[i].act_motion(vel[p]) + vJs[i]
            acc[i] = (Xup[i].act_motion(acc[p]) + ai_j
                      + cross_motion(vel[i], vJs[i]))
        I = _body_inertia(model, i)
        f[i] = I.mul_motion(acc[i]) + cross_force(vel[i], I.mul_motion(vel[i]))
        if fext is not None:
            f[i] = f[i] - fext[i]

    tau = jnp.zeros((model.nv,), dt)
    for i in reversed(range(model.njoints)):
        i0, n = vsl[i]
        tau = tau.at[i0:i0 + n].set(Ss[i].T @ f[i])
        p = model.parents[i]
        if p != -1:
            f[p] = f[p] + Xpl[i].act_force(f[i])
    return tau


def nonlinear_effects(model: RobotModel, q, v):
    """b(q, v): Coriolis + centrifugal + gravity."""
    return rnea(model, q, v, jnp.zeros((model.nv,), q.dtype))


def gravity_torque(model: RobotModel, q):
    z = jnp.zeros((model.nv,), q.dtype)
    return rnea(model, q, z, z)


# ---------------------------------------------------------------------------
# CRBA — joint-space inertia matrix
# ---------------------------------------------------------------------------

def _motion_matrix(X: Transform) -> jnp.ndarray:
    z = jnp.zeros_like(X.R)
    top = jnp.concatenate([X.R, skew(X.p) @ X.R], axis=-1)
    bot = jnp.concatenate([z, X.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _force_matrix(X: Transform) -> jnp.ndarray:
    z = jnp.zeros_like(X.R)
    top = jnp.concatenate([X.R, z], axis=-1)
    bot = jnp.concatenate([skew(X.p) @ X.R, X.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crba(model: RobotModel, q) -> jnp.ndarray:
    dt = q.dtype
    nv = model.nv
    v0 = jnp.zeros((nv,), dt)
    Xpl, Xup, Ss, _ = _joint_setup(model, q, v0)
    vsl = model.v_slices()

    Ic = [_body_inertia(model, i).to_matrix() for i in range(model.njoints)]
    M = jnp.zeros((nv, nv), dt)
    for i in reversed(range(model.njoints)):
        p = model.parents[i]
        if p != -1:
            Xm_inv = _motion_matrix(Xup[i])   # child ← parent
            Xf = _force_matrix(Xpl[i])        # parent ← child (forces)
            Ic[p] = Ic[p] + Xf @ Ic[i] @ Xm_inv
        i0, n = vsl[i]
        F = Ic[i] @ Ss[i]                      # (6, n)
        M = M.at[i0:i0 + n, i0:i0 + n].set(Ss[i].T @ F)
        j = i
        while model.parents[j] != -1:
            F = _force_matrix(Xpl[j]) @ F
            j = model.parents[j]
            j0, m = vsl[j]
            blk = F.T @ Ss[j]                  # (n, m)
            M = M.at[i0:i0 + n, j0:j0 + m].set(blk)
            M = M.at[j0:j0 + m, i0:i0 + n].set(blk.T)
    return M


# ---------------------------------------------------------------------------
# ABA — forward dynamics: a = ABA(q, v, tau, fext)
# ---------------------------------------------------------------------------

def aba(model: RobotModel, q, v, tau, fext: Optional[jnp.ndarray] = None,
        armature: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Articulated-body forward dynamics (replaces pinocchio::aba).

    ``armature`` optionally adds rotor inertia to the joint-space diagonal
    (reference free-fwddyn armature variant, free-fwddyn.hxx:75-99).
    """
    dt = q.dtype
    Xpl, Xup, Ss, vJs = _joint_setup(model, q, v)
    vsl = model.v_slices()
    nj = model.njoints
    g_spatial = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros((3,), dt)])

    vel: List[jnp.ndarray] = [None] * nj
    cbias: List[jnp.ndarray] = [None] * nj
    IA: List[jnp.ndarray] = [None] * nj
    pA: List[jnp.ndarray] = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        if p == -1:
            vel[i] = vJs[i]
            cbias[i] = jnp.zeros((6,), dt)
        else:
            vel[i] = Xup[i].act_motion(vel[p]) + vJs[i]
            cbias[i] = cross_motion(vel[i], vJs[i])
        I = _body_inertia(model, i)
        IA[i] = I.to_matrix()
        pA[i] = cross_force(vel[i], I.mul_motion(vel[i]))
        if fext is not None:
            pA[i] = pA[i] - fext[i]

    U: List[jnp.ndarray] = [None] * nj
    Dinv: List[jnp.ndarray] = [None] * nj
    u: List[jnp.ndarray] = [None] * nj
    for i in reversed(range(nj)):
        i0, n = vsl[i]
        S = Ss[i]
        U[i] = IA[i] @ S                       # (6, n)
        D = S.T @ U[i]                         # (n, n)
        if armature is not None:
            D = D + jnp.diag(armature[i0:i0 + n])
        Dinv[i] = jnp.linalg.inv(D)
        u[i] = tau[i0:i0 + n] - S.T @ pA[i]
        p = model.parents[i]
        if p != -1:
            Ia = IA[i] - U[i] @ Dinv[i] @ U[i].T
            pa = (pA[i] + Ia @ cbias[i]
                  + U[i] @ (Dinv[i] @ u[i]))
            Xm_inv = _motion_matrix(Xup[i])
            Xf = _force_matrix(Xpl[i])
            IA[p] = IA[p] + Xf @ Ia @ Xm_inv
            pA[p] = pA[p] + Xpl[i].act_force(pa)

    a_out = jnp.zeros((model.nv,), dt)
    acc: List[jnp.ndarray] = [None] * nj
    for i in range(nj):
        p = model.parents[i]
        a_base = (Xup[i].act_motion(g_spatial) if p == -1
                  else Xup[i].act_motion(acc[p]))
        a_base = a_base + cbias[i]
        i0, n = vsl[i]
        qdd = Dinv[i] @ (u[i] - U[i].T @ a_base)
        acc[i] = a_base + Ss[i] @ qdd
        a_out = a_out.at[i0:i0 + n].set(qdd)
    return a_out


class KinCache:
    """One second-order kinematics pass shared by contacts/costs/dynamics:
    world placements, joint-local velocities and q̈=0 bias accelerations,
    plus the per-joint setup needed for Jacobians."""

    def __init__(self, model: RobotModel, q, v):
        self.model = model
        self.q, self.v = q, v
        self.Xpl, self.Xup, self.Ss, self.vJs = _joint_setup(model, q, v)
        oMi, vel, acc = [], [], []
        for i in range(model.njoints):
            p = model.parents[i]
            if p == -1:
                oMi.append(self.Xpl[i])
                vel.append(self.vJs[i])
                acc.append(cross_motion(vel[i], self.vJs[i]))
            else:
                oMi.append(oMi[p].compose(self.Xpl[i]))
                vel.append(self.Xup[i].act_motion(vel[p]) + self.vJs[i])
                acc.append(self.Xup[i].act_motion(acc[p])
                           + cross_motion(vel[i], self.vJs[i]))
        self.oMi, self.vels, self.biasacc = oMi, vel, acc

    def frame_placement(self, fid: int) -> Transform:
        return frame_placement(self.model, self.oMi, fid)

    def frame_velocity(self, fid: int):
        return frame_motion_local(self.model, self.vels, fid)

    def frame_bias_acc(self, fid: int):
        return frame_motion_local(self.model, self.biasacc, fid)

    def frame_jacobian_local(self, fid: int):
        Jw = joint_jacobian_world(self.model, self.oMi, self.Ss,
                                  self.model.frame_parents[fid])
        inv = self.frame_placement(fid).inverse()
        return jax.vmap(inv.act_motion, in_axes=1, out_axes=1)(Jw)


def bias_accelerations(model: RobotModel, q, v):
    """Per-joint spatial acceleration for q̈=0 and no gravity (the kinematic
    J̇·q̇ bias used as the contact drift; pinocchio computeAllTerms
    convention).  Returns (oMi, vels, accs) in joint-local frames."""
    Xpl, Xup, Ss, vJs = _joint_setup(model, q, v)
    oMi: List[Transform] = []
    vel: List[jnp.ndarray] = []
    acc: List[jnp.ndarray] = []
    for i in range(model.njoints):
        p = model.parents[i]
        if p == -1:
            oMi.append(Xpl[i])
            vel.append(vJs[i])
            acc.append(cross_motion(vel[i], vJs[i]))
        else:
            oMi.append(oMi[p].compose(Xpl[i]))
            vel.append(Xup[i].act_motion(vel[p]) + vJs[i])
            acc.append(Xup[i].act_motion(acc[p]) + cross_motion(vel[i], vJs[i]))
    return oMi, vel, acc


def frame_motion_local(model: RobotModel, per_joint, fid: int):
    """Transform a per-joint local motion (velocity/acceleration) to the
    frame's LOCAL frame."""
    j = model.frame_parents[fid]
    fX = Transform(model.fp_R[fid], model.fp_p[fid])
    return fX.inverse().act_motion(per_joint[j])


def centroidal_momentum(model: RobotModel, q, v):
    """h = A(q)·v: spatial momentum [lin; ang] about the CoM, world-aligned
    (pinocchio computeCentroidalMomentum convention)."""
    oMi, vels = forward_kinematics(model, q, v)
    com = center_of_mass(model, q)
    h = jnp.zeros((6,), q.dtype)
    for i in range(model.njoints):
        I = _body_inertia(model, i)
        h_local = I.mul_motion(vels[i])                      # joint-local
        h_world = oMi[i].act_force(h_local)                   # about world origin
        h = h + h_world
    # shift to com: f_com = translate(world force) by -com
    lin, ang = h[:3], h[3:]
    return jnp.concatenate([lin, ang - jnp.cross(com, lin)])


# ---------------------------------------------------------------------------
# Center of mass
# ---------------------------------------------------------------------------

def center_of_mass(model: RobotModel, q) -> jnp.ndarray:
    oMi, _ = forward_kinematics(model, q)
    total_m = jnp.sum(model.mass)
    com = jnp.zeros((3,), q.dtype)
    for i in range(model.njoints):
        com = com + model.mass[i] * oMi[i].act_point(model.com[i])
    return com / total_m


def total_mass(model: RobotModel) -> jnp.ndarray:
    return jnp.sum(model.mass)
