"""Rigid-body dynamics algorithms — the Pinocchio-algorithm replacement.

TPU-native formulation.  Two design rules shape this module (they are what
distinguish it from a port of Featherstone's recursions):

1. **Level-synchronous stacked sweeps.**  All per-joint quantities live in
   stacked ``(nj, ...)`` arrays; the forward kinematic sweep walks tree
   *levels* (joints at the same depth batch into one operation), so the
   quadruped's four legs advance in parallel and the traced graph is
   O(depth), not O(njoints × depth).

2. **Jacobian-form dynamics.**  Instead of the sequential CRBA/RNEA/ABA
   recursions (long dependency chains of tiny ops — poison for a TPU), the
   joint-space quantities come from dense contractions over stacked world
   Jacobians:  ``M = Σ_i J_iᵀ I_i J_i`` (kinetic-energy identity),
   ``b = Σ_i J_iᵀ (I_i a_i + v_i ×* I_i v_i)``, and forward dynamics is a
   Cholesky solve ``a = M⁻¹(τ − b)``.  A few einsums and one batched
   ``cholesky`` replace hundreds of dependent 3×3 operations.

The recursive RNEA is kept (`rnea`) as an independently-constructed oracle:
the test suite cross-checks the Jacobian-form results against it
(tests/test_dynamics.py), mirroring the reference's numdiff-oracle strategy.

Replaces pinocchio::{forwardKinematics, rnea, crba, aba, computeAllTerms,
getFrameJacobian, centerOfMass} used throughout the reference's multibody
layer (e.g. free-fwddyn.hxx:62-74, contact-fwddyn.hxx:77-99).  Functions take
a single (q, v) — batch with vmap.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import lie
from .model import JointType, RobotModel
from .spatial import (Inertia, Transform, cross_force, cross_motion, mm, mv,
                      skew)


# ---------------------------------------------------------------------------
# Static tree metadata (computed in Python at trace time, cached)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _tree_meta(parents: Tuple[int, ...], joint_types: Tuple[int, ...],
               frame_parents: Tuple[int, ...]):
    nj = len(parents)
    depth = [0] * nj
    for i in range(nj):
        depth[i] = 0 if parents[i] == -1 else depth[parents[i]] + 1
    maxd = max(depth)
    levels = tuple(tuple(i for i in range(nj) if depth[i] == d)
                   for d in range(maxd + 1))
    # v-dof layout
    v_off, off = [], 0
    for t in joint_types:
        v_off.append(off)
        off += 6 if JointType(t) == JointType.FREE_FLYER else 1
    nv = off
    # ancestor dof masks: amask[i, v] = 1 if dof v belongs to an ancestor of
    # joint i (including i itself)
    amask = np.zeros((nj, nv))
    for i in range(nj):
        j = i
        while j != -1:
            n = 6 if JointType(joint_types[j]) == JointType.FREE_FLYER else 1
            amask[i, v_off[j]:v_off[j] + n] = 1.0
            j = parents[j]
    # dof → joint map (for scattering joint columns into (nv, 6))
    dof_joint = np.zeros((nv,), dtype=np.int64)
    for j in range(nj):
        n = 6 if JointType(joint_types[j]) == JointType.FREE_FLYER else 1
        dof_joint[v_off[j]:v_off[j] + n] = j
    # level-order (BFS) permutation for the scatter-free sweep: joints in
    # level-concatenation order, its inverse, and each joint's parent's
    # POSITION within the previous level (a tree parent is always exactly
    # one level up).
    perm = [i for lvl in levels for i in lvl]
    inv_perm = np.argsort(np.asarray(perm))
    par_pos = []
    for d in range(1, len(levels)):
        prev = {j: k for k, j in enumerate(levels[d - 1])}
        par_pos.append(tuple(prev[parents[i]] for i in levels[d]))
    return (levels, tuple(v_off), nv, amask, dof_joint,
            tuple(perm), inv_perm, tuple(par_pos))


def _meta(model: RobotModel):
    return _tree_meta(model.parents, model.joint_types, model.frame_parents)


# ---------------------------------------------------------------------------
# Stacked joint setup + level-synchronous kinematic sweep
# ---------------------------------------------------------------------------

def _stacked_setup(model: RobotModel, q, v):
    """Stacked per-joint (Xpl parent←joint, vJ local, S6 local) arrays.

    Assumes at most one FREE_FLYER and, if present, it is joint 0 (all models
    built by ModelBuilder satisfy this)."""
    dt = q.dtype
    nj = model.njoints
    levels, v_off, nv, amask, dof_joint, _, _, _ = _meta(model)
    types = [JointType(t) for t in model.joint_types]
    has_ff = types[0] == JointType.FREE_FLYER
    assert all(t != JointType.FREE_FLYER for t in types[1:]), \
        "free-flyer joints must be the root"

    # --- 1-dof joints, batched -------------------------------------------
    one_ids = list(range(1, nj)) if has_ff else list(range(nj))
    if one_ids:
        qi = jnp.asarray([v_off[j] + (1 if has_ff else 0) for j in one_ids])
        # q index of a 1-dof joint: nq offset = v_off + 1 when FF root (nq=nv+1)
        qj = jnp.take(q, qi)                        # (k,)
        vj = jnp.take(v, jnp.asarray([v_off[j] for j in one_ids]))
        axis = model.axis[jnp.asarray(one_ids)]     # (k, 3)
        rev = jnp.asarray([1.0 if types[j] == JointType.REVOLUTE else 0.0
                           for j in one_ids], dt)
        R_rev = lie.exp3(axis * qj[:, None])        # (k, 3, 3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), R_rev.shape)
        R_J = jnp.where(rev[:, None, None] > 0, R_rev, eye)
        p_J = jnp.where(rev[:, None] > 0, jnp.zeros_like(axis),
                        axis * qj[:, None])
        S6_1 = jnp.where(rev[:, None] > 0,
                         jnp.concatenate([jnp.zeros_like(axis), axis], -1),
                         jnp.concatenate([axis, jnp.zeros_like(axis)], -1))
        vJ_1 = S6_1 * vj[:, None]                   # (k, 6)
    # --- assemble stacked arrays (scatter-free: the free flyer is joint 0
    # and the 1-dof joints are the contiguous rest, so rows concatenate) ----
    if one_ids:
        oi = jnp.asarray(one_ids)
        Rtree = model.jp_R[oi]
        ptree = model.jp_p[oi]
        # plain matmul (not einsum): einsum's dot_general with stacked batch
        # dims trips an XLA simplification-pass verifier bug under
        # vmap∘vmap∘jacfwd (observed on both the CPU and TPU backends)
        R_1 = mm(Rtree, R_J)
        p_1 = ptree + mv(Rtree, p_J)
    if has_ff:
        Rff = lie.quat_to_rot(q[3:7])
        ff_R = mm(model.jp_R[0], Rff)[None]
        ff_p = (model.jp_p[0] + mv(model.jp_R[0], q[:3]))[None]
        ff_S6 = jnp.zeros((1, 6), dt)
        ff_vJ = v[None, :6]
        if one_ids:
            R_pl = jnp.concatenate([ff_R, R_1])
            p_pl = jnp.concatenate([ff_p, p_1])
            S6 = jnp.concatenate([ff_S6, S6_1])
            vJ = jnp.concatenate([ff_vJ, vJ_1])
        else:
            R_pl, p_pl, S6, vJ = ff_R, ff_p, ff_S6, ff_vJ
    elif one_ids:
        R_pl, p_pl, S6, vJ = R_1, p_1, S6_1, vJ_1
    else:
        raise ValueError("empty model")
    return Transform(R_pl, p_pl), S6, vJ


class KinArrays(NamedTuple):
    """The differentiable array outputs of one KinData sweep.

    This is the linearization seam of the analytic node-derivative path
    (models/multibody/nodes.py:_tangent_outputs): the kinematic sweep is
    linearized ONCE into these arrays, and every downstream dynamics /
    residual tangent is a cheap contraction of them — the TPU analogue of
    the reference's computeRNEADerivatives + KKT-inverse derivative chain
    (contact-fwddyn.hxx:126-159)."""

    oR: jnp.ndarray        # (nj, 3, 3) world joint rotations
    op: jnp.ndarray        # (nj, 3) world joint origins
    vels: jnp.ndarray      # (nj, 6) joint-local spatial velocities
    biasacc: jnp.ndarray   # (nj, 6) joint-local bias accelerations
    Jcols: jnp.ndarray     # (nv, 6) world Jacobian columns
    vel_w: jnp.ndarray     # (nj, 6) world spatial velocities
    Iw_c: jnp.ndarray      # (nj, 3) world com positions
    Iw_Ic: jnp.ndarray     # (nj, 3, 3) world rotational inertias


class KinData:
    """Stacked second-order kinematics + world Jacobian columns.

    One sweep shared by contacts/costs/dynamics (the role of pinocchio
    computeAllTerms + getFrameJacobian in contact-fwddyn.hxx:59-99)."""

    @classmethod
    def from_arrays(cls, model: RobotModel, q, v, arrays: "KinArrays"):
        """Rebuild a KinData view from precomputed sweep outputs (no sweep).

        Used by the analytic node-derivative path so tangent evaluations
        reuse the linearized sweep instead of re-differentiating it."""
        self = cls.__new__(cls)
        self.model = model
        self.q, self.v = q, v
        _, _, _, amask_np, _, _, _, _ = _meta(model)
        self.amask = jnp.asarray(amask_np, q.dtype)
        self.oMi = Transform(arrays.oR, arrays.op)
        self.vels = arrays.vels
        self.biasacc = arrays.biasacc
        self.Jcols = arrays.Jcols
        self.vel_w = arrays.vel_w
        self.I_w = Inertia(m=model.mass, c=arrays.Iw_c, I_c=arrays.Iw_Ic)
        return self

    def arrays(self) -> "KinArrays":
        return KinArrays(oR=self.oMi.R, op=self.oMi.p, vels=self.vels,
                         biasacc=self.biasacc, Jcols=self.Jcols,
                         vel_w=self.vel_w, Iw_c=self.I_w.c, Iw_Ic=self.I_w.I_c)

    def __init__(self, model: RobotModel, q, v):
        self.model = model
        self.q, self.v = q, v
        dt = q.dtype
        nj = model.njoints
        (levels, v_off, nv, amask_np, dof_joint,
         perm, inv_perm, par_pos) = _meta(model)
        self.amask = jnp.asarray(amask_np, dt)          # (nj, nv)
        Xpl, S6, vJ = _stacked_setup(model, q, v)
        self.Xpl = Xpl
        Xup = Xpl.inverse()
        self.Xup = Xup

        # level-synchronous FK, SCATTER-FREE: each level's rows are computed
        # from gathers out of the previous level only (a tree parent is one
        # level up), the per-level slices are concatenated in level order,
        # and one inverse-permutation gather restores joint order — no
        # .at[].set scatters anywhere in the sweep (scatters under the
        # jacfwd tangent pass were a measured hot spot).
        R = Xpl.R
        p = Xpl.p
        i0 = jnp.asarray(levels[0])
        oR_ls = [R[i0]]
        op_ls = [p[i0]]
        vel_ls = [vJ[i0]]
        bias_ls = [cross_motion(vJ[i0], vJ[i0])]
        for d, lvl in enumerate(levels[1:]):
            idx = jnp.asarray(lvl)
            pp = jnp.asarray(par_pos[d])
            Rp, ppt = oR_ls[-1][pp], op_ls[-1][pp]
            Xup_l = Transform(Xup.R[idx], Xup.p[idx])
            v_l = Xup_l.act_motion(vel_ls[-1][pp]) + vJ[idx]
            oR_ls.append(mm(Rp, R[idx]))
            op_ls.append(ppt + mv(Rp, p[idx]))
            vel_ls.append(v_l)
            bias_ls.append(Xup_l.act_motion(bias_ls[-1][pp])
                           + cross_motion(v_l, vJ[idx]))
        inv = jnp.asarray(inv_perm)
        if len(oR_ls) == 1:
            oR, op_ = oR_ls[0], op_ls[0]
            vel, bias = vel_ls[0], bias_ls[0]
        else:
            oR = jnp.concatenate(oR_ls)[inv]
            op_ = jnp.concatenate(op_ls)[inv]
            vel = jnp.concatenate(vel_ls)[inv]
            bias = jnp.concatenate(bias_ls)[inv]
        self.oMi = Transform(oR, op_)    # stacked (nj,)
        self.vels = vel                  # (nj, 6) joint-local
        self.biasacc = bias              # (nj, 6) joint-local, q̈=0, no gravity

        # world Jacobian columns: (nv, 6); column v = world spatial velocity
        # of unit q̇_v
        cols_j = self.oMi.act_motion(S6)             # (nj, 6) 1-dof columns
        if JointType(model.joint_types[0]) == JointType.FREE_FLYER:
            X0 = Transform(oR[0], op_[0])
            ff_cols = X0.act_motion(jnp.eye(6, dtype=dt))  # (6, 6) rows=basis
            cols = jnp.concatenate(
                [ff_cols,
                 jnp.take(cols_j, jnp.asarray(dof_joint[6:]), axis=0)])
        else:
            cols = jnp.take(cols_j, jnp.asarray(dof_joint), axis=0)
        self.Jcols = cols                             # (nv, 6)

        # world-frame body spatial quantities (for M/b contractions)
        self.vel_w = self.oMi.act_motion(vel)         # (nj, 6)
        c_w = self.oMi.act_point(model.com)           # (nj, 3) com positions
        R_w = oR
        self.I_w = Inertia(m=model.mass, c=c_w,
                           I_c=mm(mm(R_w, model.inertia),
                                  jnp.swapaxes(R_w, -1, -2)))

    # -- joint-space dynamics quantities ----------------------------------
    def joint_jacobians_world(self):
        """(nj, 6, nv): world body Jacobian of every joint."""
        return self.Jcols.T[None, :, :] * self.amask[:, None, :]

    def mass_matrix(self, armature=None):
        """M = Σ_i J_iᵀ I_i J_i (kinetic-energy identity; replaces CRBA).

        Kept as broadcast-multiply-reduce: einsum/dot_general here (stacked
        vmap batch dims under jacfwd) still trips the XLA TPU
        simplification-pass verifier bug noted in spatial.py."""
        Jw = self.joint_jacobians_world()
        Iw = self.I_w.to_matrix()                     # (nj, 6, 6)
        T1 = (Jw[:, :, None, :] * Iw[:, :, :, None]).sum(1)
        M = (T1[:, :, :, None] * Jw[:, :, None, :]).sum((0, 1))
        if armature is not None:
            M = M + jnp.diag(armature)
        return M

    def mass_matrix_vec(self, a):
        """M(q)·a WITHOUT building M — vector intermediates only.

        M·a = Σ_i J_iᵀ I_i (J_i a); the per-joint spatial velocity J_i·a is
        (nj, 6), so differentiating this (the ``dM·a`` term of the KKT
        tangent, contact-fwddyn.hxx:132-147) never materializes the
        (nj, 6, 6, nv) mass-contraction intermediates that AD through
        ``mass_matrix`` would."""
        u = self.Jcols * a[:, None]                          # (nv, 6)
        Ja = (u[None, :, :] * self.amask[:, :, None]).sum(1)  # (nj, 6)
        f = self.I_w.mul_motion(Ja)                          # (nj, 6)
        fb = (f[:, None, :] * self.amask[:, :, None])        # (nj, nv, 6)
        return (fb * self.Jcols[None, :, :]).sum((0, 2))     # (nv,)

    def bias_forces(self, fext_local=None):
        """b(q, v) = Σ_i J_iᵀ (I_i(a_bias_i − g) + v_i ×* I_i v_i)
        (replaces the RNEA backward sweep; gravity enters as the d'Alembert
        base acceleration)."""
        dt = self.q.dtype
        g6 = jnp.concatenate([-self.model.gravity.astype(dt),
                              jnp.zeros((3,), dt)])
        a_w = self.oMi.act_motion(self.biasacc) + g6
        f_w = (self.I_w.mul_motion(a_w)
               + cross_force(self.vel_w, self.I_w.mul_motion(self.vel_w)))
        if fext_local is not None:
            f_w = f_w - self.oMi.act_force(fext_local)
        Jw = self.joint_jacobians_world()
        return (Jw * f_w[:, :, None]).sum((0, 1))

    # -- frame quantities --------------------------------------------------
    def _fX(self, fid: int) -> Transform:
        m = self.model
        return Transform(m.fp_R[fid], m.fp_p[fid])

    def frame_placement(self, fid: int) -> Transform:
        j = self.model.frame_parents[fid]
        return Transform(self.oMi.R[j], self.oMi.p[j]).compose(self._fX(fid))

    def frame_velocity(self, fid: int):
        j = self.model.frame_parents[fid]
        return self._fX(fid).act_motion_inv(self.vels[j])

    def frame_bias_acc(self, fid: int):
        j = self.model.frame_parents[fid]
        return self._fX(fid).act_motion_inv(self.biasacc[j])

    def frame_jacobian_world(self, fid: int):
        """(6, nv) world-frame Jacobian — one mask multiply, no chain walk."""
        j = self.model.frame_parents[fid]
        return (self.Jcols * self.amask[j][:, None]).T

    def frame_jacobian_local(self, fid: int):
        cols = self.Jcols * self.amask[self.model.frame_parents[fid]][:, None]
        inv = self.frame_placement(fid).inverse()
        return inv.act_motion(cols).T                 # (6, nv)

    # -- global quantities -------------------------------------------------
    def com(self):
        m = self.model.mass
        return (m[:, None] * self.I_w.c).sum(0) / jnp.sum(m)

    def com_velocity(self, vdof):
        """d(com)/dt under joint velocity ``vdof`` — i.e. Jcom·vdof
        (pinocchio jacobianCenterOfMass contracted with v).  Uses the stacked
        world Jacobian columns: per-body world spatial velocity u_b, then the
        body-CoM point velocity u_lin + u_ang × c_i, mass-averaged."""
        u = self.Jcols * vdof[:, None]                       # (nv, 6)
        u_b = (u[None, :, :] * self.amask[:, :, None]).sum(1)  # (nj, 6)
        cdot = u_b[:, :3] + jnp.cross(u_b[:, 3:], self.I_w.c)
        m = self.model.mass
        return (m[:, None] * cdot).sum(0) / jnp.sum(m)

    def centroidal_momentum(self):
        h_w = self.oMi.act_force(
            Inertia(m=self.model.mass, c=self.model.com,
                    I_c=self.model.inertia).mul_motion(self.vels))
        h = jnp.sum(h_w, axis=0)
        com = self.com()
        lin, ang = h[:3], h[3:]
        return jnp.concatenate([lin, ang - jnp.cross(com, lin)])


# Backwards-compatible alias used by the model layer
KinCache = KinData


# ---------------------------------------------------------------------------
# Closed-form sweep linearization — all ndx tangent directions at once
# ---------------------------------------------------------------------------

def kin_tangent_basis(kin: KinData) -> KinArrays:
    """Directional derivatives of every KinArrays field for ALL ndx tangent
    basis directions [dq (nv); dv (nv)], leading axis (ndx,).

    Replaces ``jax.linearize`` of the level-synchronous sweep in the node
    derivative path (models/multibody/nodes.py:_tangent_outputs): instead of
    re-running the linearized level loop per direction, every tangent is a
    closed-form masked contraction of PRIMAL sweep outputs — the spatial-
    algebra identities behind Pinocchio's analytic derivatives
    (reference contact-fwddyn.hxx:126-159 via computeRNEADerivatives):

    * a world quantity attached to body i differentiates along tangent dof d
      as the action of the velocity field of that dof, which is exactly the
      world Jacobian column S_d = Jcols[d] (for the free-flyer's local
      perturbation convention included), masked by ancestry:
        d op_i   = S_d.lin + S_d.ang x op_i
        d oR_i   = skew(S_d.ang) oR_i
        d S_e    = ad(S_d) S_e                   (d ancestor-dof of e)
    * world body velocities v_i = sum_{e<=i} S_e qdot_e give
        dv_i/dq_d = ad(S_d)(v_i - v_{parent(joint(d))})
        dv_i/dv_d = S_d
      and the JOINT-LOCAL velocity tangent collapses to
        d vels_i/dq_d = -Ad_{X_i^-1} ad(S_d) v_{parent(joint(d))}
      (local quantities are invariant under rigid motion of the whole
      ancestor chain, so only the parent-velocity term survives).
    * the bias acceleration telescopes as b_i = sum_{k<=i} beta_k with
      beta_k = ad(v_k) (v_k - v_{p(k)}), whose per-joint tangents are two
      nested brackets; the ancestor sum is one masked (nj x nj) contraction.

    Exactness is pinned against ``jax.linearize`` of the sweep in
    tests/test_kin_tangents.py.
    """
    model = kin.model
    levels, v_off, nv, amask_np, dof_joint, _, _, _ = _meta(model)
    dt = kin.q.dtype
    nj = model.njoints
    dofj = np.asarray(dof_joint)

    amask = kin.amask                                   # (nj, nv)
    Mq = amask.T                                        # (nv_dir, nj)
    # dof-level ancestry: Am2[d, e] = 1 iff joint(d) is anc-or-self of joint(e)
    Am2 = jnp.asarray(amask_np[dofj].T, dt)             # (nv_dir, nv_col)
    # joint-level anc-or-self mask Jm[i, k]
    Jm = jnp.asarray(amask_np[:, np.asarray([v_off[k] for k in range(nj)])],
                     dt)                                # (nj, nj)
    parents = np.asarray(model.parents)
    par_idx = jnp.asarray(np.where(parents == -1, 0, parents))
    not_root = jnp.asarray((parents != -1).astype(np.float64), dt)

    S = kin.Jcols                                       # (nv, 6)
    oR, op = kin.oMi.R, kin.oMi.p
    vw = kin.vel_w                                      # (nj, 6)
    vp_w = vw[par_idx] * not_root[:, None]              # (nj, 6)
    vJ_w = vw - vp_w
    wv = vp_w[jnp.asarray(dofj)]                        # (nv, 6) per-dof parent vel
    bias_w = kin.oMi.act_motion(kin.biasacc)            # (nj, 6)
    X = Transform(oR, op)                               # broadcasts over (nv, nj)

    Sv, Sw = S[:, :3], S[:, 3:]
    skew_Sw = skew(Sw)                                  # (nv, 3, 3)

    # ---- q-direction tangents -------------------------------------------
    doR = Mq[..., None, None] * mm(skew_Sw[:, None], oR[None])
    dop = Mq[..., None] * (Sv[:, None] + jnp.cross(Sw[:, None], op[None]))
    cm_S_vw = cross_motion(S[:, None], vw[None])        # (nv, nj, 6)
    cm_S_wv = cross_motion(S, wv)                       # (nv, 6)
    dvel_w_q = Mq[..., None] * (cm_S_vw - cm_S_wv[:, None])
    dvels_q = -Mq[..., None] * X.act_motion_inv(
        jnp.broadcast_to(cm_S_wv[:, None], (nv, nj, 6)))
    dbeta_q = (cross_motion(dvel_w_q, vJ_w[None])
               + Mq[..., None] * cross_motion(
                   vw[None], cross_motion(S[:, None], vJ_w[None])))
    dbias_w_q = jnp.einsum("ik,dkx->dix", Jm, dbeta_q)
    dbias_q = X.act_motion_inv(
        dbias_w_q - Mq[..., None] * cross_motion(S[:, None], bias_w[None]))
    dJcols_q = Am2[..., None] * cross_motion(S[:, None], S[None])
    c_w, Ic_w = kin.I_w.c, kin.I_w.I_c
    dc_q = Mq[..., None] * (Sv[:, None] + jnp.cross(Sw[:, None], c_w[None]))
    dIc_q = Mq[..., None, None] * (mm(skew_Sw[:, None], Ic_w[None])
                                   - mm(Ic_w[None], skew_Sw[:, None]))

    # ---- v-direction tangents -------------------------------------------
    dvel_w_v = Mq[..., None] * jnp.broadcast_to(S[:, None], (nv, nj, 6))
    dvels_v = Mq[..., None] * X.act_motion_inv(
        jnp.broadcast_to(S[:, None], (nv, nj, 6)))
    onehot = jnp.asarray(np.eye(nj)[dofj], dt)          # (nv, nj)
    dbeta_v = (Mq[..., None] * cross_motion(S[:, None], vJ_w[None])
               + onehot[..., None] * cross_motion(vw[None], S[:, None]))
    dbias_w_v = jnp.einsum("ik,dkx->dix", Jm, dbeta_v)
    dbias_v = X.act_motion_inv(dbias_w_v)

    z = jnp.zeros
    return KinArrays(
        oR=jnp.concatenate([doR, z((nv, nj, 3, 3), dt)]),
        op=jnp.concatenate([dop, z((nv, nj, 3), dt)]),
        vels=jnp.concatenate([dvels_q, dvels_v]),
        biasacc=jnp.concatenate([dbias_q, dbias_v]),
        Jcols=jnp.concatenate([dJcols_q, z((nv, nv, 6), dt)]),
        vel_w=jnp.concatenate([dvel_w_q, dvel_w_v]),
        Iw_c=jnp.concatenate([dc_q, z((nv, nj, 3), dt)]),
        Iw_Ic=jnp.concatenate([dIc_q, z((nv, nj, 3, 3), dt)]),
    )


# ---------------------------------------------------------------------------
# Functional API (wrappers over KinData)
# ---------------------------------------------------------------------------

def forward_kinematics(model: RobotModel, q, v=None):
    """Returns (stacked oMi Transform (nj,...), stacked local velocities
    (nj, 6))."""
    if v is None:
        v = jnp.zeros((model.nv,), q.dtype)
    kd = KinData(model, q, v)
    return kd.oMi, kd.vels


def frame_placement(model: RobotModel, oMi: Transform, fid: int) -> Transform:
    j = model.frame_parents[fid]
    return Transform(oMi.R[j], oMi.p[j]).compose(
        Transform(model.fp_R[fid], model.fp_p[fid]))


def frame_velocity(model: RobotModel, vels, fid: int) -> jnp.ndarray:
    """Frame spatial velocity in the LOCAL frame."""
    j = model.frame_parents[fid]
    fX = Transform(model.fp_R[fid], model.fp_p[fid])
    return fX.act_motion_inv(vels[j])


def frame_jacobian(model: RobotModel, q, fid: int,
                   reference_frame: str = "local") -> jnp.ndarray:
    """(6, nv) frame Jacobian; 'local', 'world', or 'local_world_aligned'."""
    kd = KinData(model, q, jnp.zeros((model.nv,), q.dtype))
    if reference_frame == "world":
        return kd.frame_jacobian_world(fid)
    Jl = kd.frame_jacobian_local(fid)
    if reference_frame == "local":
        return Jl
    oMf = kd.frame_placement(fid)
    Ralign = Transform(oMf.R, jnp.zeros((3,), q.dtype))
    return Ralign.act_motion(Jl.T).T


def crba(model: RobotModel, q) -> jnp.ndarray:
    """Joint-space inertia matrix M(q) (Jacobian-form; replaces
    pinocchio::crba)."""
    return KinData(model, q, jnp.zeros((model.nv,), q.dtype)).mass_matrix()


def nonlinear_effects(model: RobotModel, q, v):
    """b(q, v): Coriolis + centrifugal + gravity (Jacobian-form)."""
    return KinData(model, q, v).bias_forces()


def gravity_torque(model: RobotModel, q):
    z = jnp.zeros((model.nv,), q.dtype)
    return KinData(model, q, z).bias_forces()


def aba(model: RobotModel, q, v, tau, fext: Optional[jnp.ndarray] = None,
        armature: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Forward dynamics a = M⁻¹(τ − b) via batched Cholesky (replaces
    pinocchio::aba; the O(n) articulated-body recursion is a long sequential
    chain of tiny ops — the dense solve is faster on TPU for robot-scale nv).

    ``armature`` adds rotor inertia to the joint-space diagonal (reference
    free-fwddyn armature variant, free-fwddyn.hxx:75-99)."""
    kd = KinData(model, q, v)
    M = kd.mass_matrix(armature)
    b = kd.bias_forces(fext)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), tau - b)


# ---------------------------------------------------------------------------
# Recursive RNEA — kept as the independently-constructed oracle (and for
# τ(q, v, a) with arbitrary a).  Level-synchronous stacked implementation.
# ---------------------------------------------------------------------------

def rnea(model: RobotModel, q, v, a, fext: Optional[jnp.ndarray] = None):
    """Inverse dynamics τ = M(q)a + b(q, v) − τ_ext (recursive Newton-Euler).

    fext: optional (njoints, 6) external forces in each JOINT-LOCAL frame."""
    dt = q.dtype
    nj = model.njoints
    levels, v_off, nv, _, dof_joint, _, _, _ = _meta(model)
    Xpl, S6, vJ = _stacked_setup(model, q, v)
    Xup = Xpl.inverse()
    has_ff = JointType(model.joint_types[0]) == JointType.FREE_FLYER

    # joint-space acceleration → per-joint local spatial Sa
    Sa = S6 * jnp.take(a, jnp.asarray(
        [v_off[j] for j in range(nj)]))[:, None]
    if has_ff:
        Sa = Sa.at[0].set(a[:6])

    g6 = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros((3,), dt)])

    # forward sweep (level-synchronous)
    vel = vJ
    i0 = jnp.asarray(levels[0])
    acc = jnp.zeros((nj, 6), dt)
    acc = acc.at[i0].set(
        Transform(Xup.R[i0], Xup.p[i0]).act_motion(g6)
        + Sa[i0] + cross_motion(vel[i0], vJ[i0]))
    for lvl in levels[1:]:
        idx = jnp.asarray(lvl)
        par = jnp.asarray([model.parents[i] for i in lvl])
        Xup_l = Transform(Xup.R[idx], Xup.p[idx])
        v_l = Xup_l.act_motion(vel[par]) + vJ[idx]
        vel = vel.at[idx].set(v_l)
        acc = acc.at[idx].set(Xup_l.act_motion(acc[par]) + Sa[idx]
                              + cross_motion(v_l, vJ[idx]))

    I = Inertia(m=model.mass, c=model.com, I_c=model.inertia)
    f = I.mul_motion(acc) + cross_force(vel, I.mul_motion(vel))
    if fext is not None:
        f = f - fext

    # backward sweep (level-synchronous scatter-add to parents)
    tau = jnp.zeros((nv,), dt)
    for lvl in reversed(levels):
        idx = jnp.asarray(lvl)
        ti = (S6[idx] * f[idx]).sum(-1)
        tau = tau.at[jnp.asarray([v_off[j] for j in lvl])].set(ti)
        par_py = [model.parents[i] for i in lvl]
        if par_py[0] != -1:
            par = jnp.asarray(par_py)
            fp = Transform(Xpl.R[idx], Xpl.p[idx]).act_force(f[idx])
            f = f.at[par].add(fp)
    if has_ff:
        tau = tau.at[:6].set(f[0])
    return tau


# ---------------------------------------------------------------------------
# Global quantities
# ---------------------------------------------------------------------------

def centroidal_momentum(model: RobotModel, q, v):
    """h = A(q)·v: spatial momentum [lin; ang] about the CoM, world-aligned
    (pinocchio computeCentroidalMomentum convention)."""
    return KinData(model, q, v).centroidal_momentum()


def center_of_mass(model: RobotModel, q) -> jnp.ndarray:
    return KinData(model, q, jnp.zeros((model.nv,), q.dtype)).com()


def total_mass(model: RobotModel) -> jnp.ndarray:
    return jnp.sum(model.mass)


# ---------------------------------------------------------------------------
# Closed-form generalized-force derivatives (GEMM form)
# ---------------------------------------------------------------------------

def _CM(m):
    """Matrix of s ↦ cross_motion(s, m) (m fixed), (..., 6, 6)."""
    ml, ma = m[..., :3], m[..., 3:]
    sl, sa = skew(ml), skew(ma)
    z = jnp.zeros_like(sl)
    top = jnp.concatenate([-sa, -sl], axis=-1)
    bot = jnp.concatenate([z, -sa], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _CF(h):
    """Matrix of s ↦ cross_force(s, h) (h fixed), (..., 6, 6)."""
    hl, hn = h[..., :3], h[..., 3:]
    sl, sn = skew(hl), skew(hn)
    z = jnp.zeros_like(sl)
    top = jnp.concatenate([z, -sl], axis=-1)
    bot = jnp.concatenate([-sl, -sn], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _AD(v):
    """Matrix of z ↦ cross_motion(v, z) (v fixed), (..., 6, 6)."""
    vl, vw = v[..., :3], v[..., 3:]
    swl, sww = skew(vl), skew(vw)
    z = jnp.zeros_like(swl)
    top = jnp.concatenate([sww, swl], axis=-1)
    bot = jnp.concatenate([z, sww], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _ADs(v):
    """Matrix of z ↦ cross_force(v, z) (v fixed), (..., 6, 6)."""
    vl, vw = v[..., :3], v[..., 3:]
    swl, sww = skew(vl), skew(vw)
    z = jnp.zeros_like(swl)
    top = jnp.concatenate([sww, z], axis=-1)
    bot = jnp.concatenate([swl, sww], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gforce_derivatives(kin: KinData, a, ext_w=None):
    """Closed-form (dG_dq, dG_dv), each (nv, nv), of the generalized force

        G(q, v) = M(q)·a + b(q, v) − Σ_c J_cᵀ(q)·ext_c

    at fixed joint acceleration ``a`` and fixed world-frame external
    wrenches ``ext_w`` (nj, 6; about the world origin, attached per body).
    This is the reference's computeRNEADerivatives role
    (contact-fwddyn.hxx:126-147) in TPU-native GEMM form: every term is a
    per-body 6×6 kernel contracted through the masked world Jacobian
    (result = Σ_i J_iᵀ K_i J_i + pair contractions), so no
    (ndx, nj, 6) tangent towers are materialized — the intermediates are
    (nj, nv, 6) and (nj, nv, nv) tensors feeding plain GEMMs.

    Derivation: world-frame spatial-algebra identities (the same ones
    behind kin_tangent_basis); d-direction derivatives of quantities on
    body i are actions of the Jacobian column field S_d for d ⪯ i:
      dS_e = [d⪯e] ad_{S_d} S_e,   dI_i = cf_{S_d} I_i − I_i cm_{S_d},
      dv_i = [d⪯i](cm(S_d, v_i) − cm(S_d, w_d)),
      dbias_i = [d⪯i]((PS_i − PS_{p(d)}) S_d − cm(cm(S_d, w_d), v_i − w_d))
    with PS the ancestry prefix-sum of the per-joint bias kernels.
    Exactness is pinned against jax.linearize of the sweep in
    tests/test_gforce_derivs.py (atol 1e-8, f64).
    """
    model = kin.model
    levels, v_off, nv, amask_np, dof_joint, _, _, _ = _meta(model)
    dt = kin.q.dtype
    nj = model.njoints
    dofj = np.asarray(dof_joint)

    amask = kin.amask                                    # (nj, nv) [e⪯i]
    Am2 = jnp.asarray(amask_np[dofj].T, dt)              # (nv, nv) [d⪯e]
    Jm = jnp.asarray(amask_np[:, np.asarray([v_off[k] for k in range(nj)])],
                     dt)                                 # (nj, nj) [k⪯i]
    parents = np.asarray(model.parents)
    par_idx = jnp.asarray(np.where(parents == -1, 0, parents))
    not_root = jnp.asarray((parents != -1).astype(np.float64), dt)

    S = kin.Jcols                                        # (nv, 6)
    vw = kin.vel_w                                       # (nj, 6)
    vp_w = vw[par_idx] * not_root[:, None]               # (nj, 6) parent vel
    vJ_w = vw - vp_w
    dj = jnp.asarray(dofj)
    wv = vp_w[dj]                                        # (nv, 6) w_d
    vjd = vw[dj]                                         # (nv, 6) v_{joint(d)}
    bias_w = kin.oMi.act_motion(kin.biasacc)             # (nj, 6)
    g6 = jnp.concatenate([-model.gravity.astype(dt), jnp.zeros((3,), dt)])
    Iw = kin.I_w.to_matrix()                             # (nj, 6, 6)

    # world joint-space acceleration field u_i = (J a)_i
    ua = S * a[:, None]                                  # (nv, 6)
    u = jnp.einsum("ie,ex->ix", amask, ua)               # (nj, 6)
    uw = (u[par_idx] * not_root[:, None])[dj]            # (nv, 6) u_{p(d)}

    biasg = bias_w + g6                                  # (nj, 6)
    a_w = biasg + u
    h = kin.I_w.mul_motion(a_w)                          # (nj, 6) I·a_w
    h2 = kin.I_w.mul_motion(vw)                          # (nj, 6) I·v
    f = h + cross_force(vw, h2)                          # (nj, 6)
    if ext_w is not None:
        f = f - ext_w

    # per-joint bias kernels K_k = CM(vJ)·CM(v) + AD(v)·CM(vJ); ancestry
    # prefix sums PS_i = Σ_{k⪯i} K_k
    CMv = _CM(vw)
    CMvJ = _CM(vJ_w)
    K = mm(CMvJ, CMv) + mm(_AD(vw), CMvJ)                # (nj, 6, 6)
    PS = jnp.einsum("ik,kab->iab", Jm, K)                # (nj, 6, 6)
    PS_pd = (PS[par_idx] * not_root[:, None, None])[dj]  # (nv, 6, 6)

    CFh2 = _CF(h2)
    ADsv = _ADs(vw)
    # S_d-coefficient kernels
    G_q = (_CF(h) - mm(Iw, _CM(biasg)) + mm(Iw, PS)
           + mm(CFh2, CMv) + mm(ADsv, CFh2))
    if ext_w is not None:
        G_q = G_q - _CF(ext_w)
    Gv = CFh2 + mm(ADsv, Iw) + mm(Iw, CMv)               # (nj, 6, 6)
    # cw_d-coefficient kernel (q-direction): C = −Gv
    # per-dof vectors
    cw = cross_motion(S, wv)                             # (nv, 6) cm(S_d, w_d)
    cu = cross_motion(S, uw)                             # (nv, 6)
    z2 = cross_motion(cw, wv)                            # (nv, 6)
    zeta_q = -cu - jnp.einsum("dab,db->da", PS_pd, S) + z2
    cj = cross_motion(vjd, S)                            # (nv, 6)
    zeta_v = -cw + cj

    def pair_multi(kerns, rights):
        """Σ_k Σ_i [e⪯i][d⪯i] S_eᵀ kerns[k]_i rights[k]_d → (nv, nv).

        Factorized as ONE (nv, K·nj·6) @ (K·nj·6, nv) matmul per node:
        the masked i-sum and the 6-dim contraction merge into a single
        inner dimension, so no (nj, nv, nv) intermediate exists."""
        K = jnp.stack(kerns)                             # (k, nj, 6, 6)
        R = jnp.stack(rights)                            # (k, nv, 6)
        t = jnp.einsum("ea,kiab->kieb", S, K)            # (k, nj, nv, 6)
        A = (t * amask[None, :, :, None]).transpose(2, 0, 1, 3)
        A = A.reshape(nv, -1)                            # (nv, k·nj·6)
        Bm = (amask[None, :, None, :] * R.transpose(0, 2, 1)[:, None])
        Bm = Bm.reshape(-1, nv)                          # (k·nj·6, nv)
        return A @ Bm

    # dS_e term: [d⪯e] S_dᵀ cf(S_e, F_e), F_e = subtree wrench sums
    F = jnp.einsum("ie,ix->ex", amask, f)                # (nv, 6)
    QF = cross_force(S, F)                               # (nv, 6)
    T1 = jnp.einsum("eb,db->ed", QF, S) * Am2.T

    dG_dq = T1 + pair_multi([G_q, Iw, -Gv], [S, zeta_q, cw])
    dG_dv = pair_multi([Gv, Iw], [S, zeta_v])
    return dG_dq, dG_dv


class FrameTangents(NamedTuple):
    """Closed-form x-tangents of frame-local quantities at one frame
    (leading axis ndx = [dq (nv); dv (nv)]).  All built from per-dof
    cross-products with the world Jacobian columns — no (ndx, nj, ·)
    tensors (shares its subexpressions with gforce_derivatives via CSE)."""

    dxi: jnp.ndarray   # (ndx, 6) local twist of the frame placement
    dp: jnp.ndarray    # (ndx, 3) world frame-origin translation tangent
    dv: jnp.ndarray    # (ndx, 6) frame-local spatial velocity tangent
    dab: jnp.ndarray   # (ndx, 6) frame-local bias-acceleration tangent
    dJa: jnp.ndarray   # (ndx, 6) tangent of J_frame_local·a (fixed a)


def frame_tangents(kin: KinData, a, fid: int) -> FrameTangents:
    """Closed-form tangents of the frame quantities contacts/costs read
    (same spatial-algebra identities as gforce_derivatives; exactness
    pinned against jax.linearize of the sweep in
    tests/test_contacts_numdiff.py)."""
    model = kin.model
    levels, v_off, nv, amask_np, dof_joint, _, _, _ = _meta(model)
    dt = kin.q.dtype
    dofj = np.asarray(dof_joint)
    j = model.frame_parents[fid]

    parents = np.asarray(model.parents)
    par_idx = jnp.asarray(np.where(parents == -1, 0, parents))
    not_root = jnp.asarray((parents != -1).astype(np.float64), dt)
    Jm = jnp.asarray(amask_np[:, np.asarray([v_off[k]
                                             for k in range(model.njoints)])],
                     dt)
    dj = jnp.asarray(dofj)

    S = kin.Jcols                                        # (nv, 6)
    vw = kin.vel_w
    vp_w = vw[par_idx] * not_root[:, None]
    vJ_w = vw - vp_w
    wv = vp_w[dj]                                        # (nv, 6)
    vjd = vw[dj]
    bias_w = kin.oMi.act_motion(kin.biasacc)

    ua = S * a[:, None]
    u = jnp.einsum("ie,ex->ix", kin.amask, ua)           # (nj, 6)
    uw = (u[par_idx] * not_root[:, None])[dj]            # (nv, 6)

    CMv = _CM(vw)
    CMvJ = _CM(vJ_w)
    K = mm(CMvJ, CMv) + mm(_AD(vw), CMvJ)
    PS = jnp.einsum("ik,kab->iab", Jm, K)                # (nj, 6, 6)
    PS_pd = (PS[par_idx] * not_root[:, None, None])[dj]  # (nv, 6, 6)

    cw = cross_motion(S, wv)
    cu = cross_motion(S, uw)

    mask = kin.amask[j]                                  # (nv,)
    Y = kin.frame_placement(fid)
    Yinv = Y.inverse()
    zq = jnp.zeros((nv, 3), dt)
    z6 = jnp.zeros((nv, 6), dt)

    # placement: local twist xi with [d⪯j] Ad_{Y⁻¹} S_d (q only)
    dxi_q = mask[:, None] * Yinv.act_motion(S)
    # world origin translation
    dp_q = mask[:, None] * (S[:, :3] + jnp.cross(S[:, 3:], Y.p[None]))
    # frame-local velocity
    dv_q = -mask[:, None] * Yinv.act_motion(cw)
    dv_v = mask[:, None] * Yinv.act_motion(S)
    # J_frame_local·a (q only)
    dJa_q = -mask[:, None] * Yinv.act_motion(cu)
    # bias acceleration
    vj = vw[j]
    wdiff = vj[None] - wv                                # (nv, 6) v_j − w_d
    dbias_w_q = (jnp.einsum("ab,db->da", PS[j], S)
                 - jnp.einsum("dab,db->da", PS_pd, S)
                 - cross_motion(cw, wdiff))
    dab_q = mask[:, None] * Yinv.act_motion(
        dbias_w_q - cross_motion(S, bias_w[j][None]))
    dbias_w_v = cross_motion(S, wdiff) + cross_motion(vjd, S)
    dab_v = mask[:, None] * Yinv.act_motion(dbias_w_v)

    cat = jnp.concatenate
    return FrameTangents(
        dxi=cat([dxi_q, z6]), dp=cat([dp_q, zq]),
        dv=cat([dv_q, dv_v]), dab=cat([dab_q, dab_v]),
        dJa=cat([dJa_q, z6]))
