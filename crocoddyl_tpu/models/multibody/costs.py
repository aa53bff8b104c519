"""Residual-based cost library + weighted cost sum.

Reference: multibody/cost-base.hpp (residual → activation → Gauss-Newton
Hessians pattern) and multibody/costs/* for each residual definition (cited
per class).  Each cost is a pytree dataclass holding its references, an
activation, a weight and an active flag (the reference's
CostModelSum::changeCostStatus becomes a 0/1 mask array, so a single jitted
program covers any cost schedule).

A cost's ``residual(st, cache, x, u)`` reads the per-node
:class:`~crocoddyl_tpu.dynamics.algorithms.KinCache` plus solver outputs
(forces) from the node; residual Jacobians come from one node-level AD pass,
and the Gauss-Newton assembly happens in the node (nodes.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...dynamics import lie
from ...dynamics.spatial import Transform
from .activations import Activation, ActivationQuad
from .frames import CoPSupport, FrictionCone


class Cost(struct.PyTreeNode):
    activation: Activation
    weight: jax.Array
    active: jax.Array  # 0/1

    @property
    def nr(self) -> int:
        raise NotImplementedError

    def residual(self, st, cache, x, u):
        raise NotImplementedError

    def residual_jac_x(self, st, cache, x, u, ft_of):
        """Closed-form x-Jacobian of the residual, (nr, ndx), or None to
        request the generic sweep-linearization path.  ``ft_of(fid)``
        returns cached :class:`~...dynamics.algorithms.FrameTangents`.
        The force-dependence chain (∂r/∂λ·dλ) is handled separately by the
        node; this is the kinematic part only (the reference's per-cost
        calcDiff split, multibody/costs/*.hxx)."""
        return None


def _cost_fields(weight, active, activation, nr):
    return dict(
        activation=activation if activation is not None else ActivationQuad(),
        weight=jnp.asarray(weight, jnp.float64) if not hasattr(weight, "dtype")
        else weight,
        active=jnp.asarray(active, jnp.float64),
    )


class CostState(Cost):
    """r = x ⊖ xref (multibody/costs/state.hxx:137)."""

    xref: jax.Array = None

    @property
    def nr(self) -> int:
        return None  # resolved by the node (ndx)

    def residual(self, st, cache, x, u):
        return st.diff(self.xref, x)

    def residual_jac_x(self, st, cache, x, u, ft_of):
        _, J2 = st.jdiff(self.xref, x)
        return J2


class CostControl(Cost):
    """r = u − uref (multibody/costs/control.hxx)."""

    uref: jax.Array = None

    def residual(self, st, cache, x, u):
        return u - self.uref

    def residual_jac_x(self, st, cache, x, u, ft_of):
        return jnp.zeros((self.uref.shape[-1], st.ndx), x.dtype)


class CostCoM(Cost):
    """r = com(q) − cref (multibody/costs/com-position.hxx)."""

    cref: jax.Array = None

    def residual(self, st, cache, x, u):
        return cache.kin.com() - self.cref

    def residual_jac_x(self, st, cache, x, u, ft_of):
        # Jcom columns: dcom/dq_d = (m_sub·Sv + Sw × csub)/M_tot with
        # subtree mass/moment sums (GEMM form; com-position.hxx Jcom role)
        kin = cache.kin
        m = kin.model.mass
        S = kin.Jcols
        msub = jnp.einsum("ie,i->e", kin.amask, m)
        csub = jnp.einsum("ie,i,ic->ec", kin.amask, m, kin.I_w.c)
        mtot = jnp.sum(m)
        dcom_q = (msub[:, None] * S[:, :3]
                  + jnp.cross(S[:, 3:], csub)) / mtot        # (nv, 3)
        nv = S.shape[0]
        return jnp.concatenate(
            [dcom_q.T, jnp.zeros((3, st.ndx - nv), x.dtype)], axis=1)


class CostFramePlacement(Cost):
    """r = log6(Mref⁻¹ · oMf) (multibody/costs/frame-placement.hxx)."""

    fid: int = struct.field(pytree_node=False, default=0)
    ref_R: jax.Array = None
    ref_p: jax.Array = None

    def residual(self, st, cache, x, u):
        oMf = cache.frame_placement(self.fid)
        rel = Transform(self.ref_R, self.ref_p).inverse().compose(oMf)
        return lie.log6(rel.R, rel.p)

    def residual_jac_x(self, st, cache, x, u, ft_of):
        oMf = cache.frame_placement(self.fid)
        rel = Transform(self.ref_R, self.ref_p).inverse().compose(oMf)
        xi = lie.log6(rel.R, rel.p)
        ft = ft_of(self.fid)
        return (ft.dxi @ lie.jac_se3_right_inv(xi).T).T


class CostFrameTranslation(Cost):
    """r = p_frame − pref (multibody/costs/frame-translation.hxx)."""

    fid: int = struct.field(pytree_node=False, default=0)
    pref: jax.Array = None

    def residual(self, st, cache, x, u):
        return cache.frame_placement(self.fid).p - self.pref

    def residual_jac_x(self, st, cache, x, u, ft_of):
        return ft_of(self.fid).dp.T


class CostFrameRotation(Cost):
    """r = log3(Rrefᵀ · R_frame) (multibody/costs/frame-rotation.hxx)."""

    fid: int = struct.field(pytree_node=False, default=0)
    ref_R: jax.Array = None

    def residual(self, st, cache, x, u):
        R = cache.frame_placement(self.fid).R
        return lie.log3(lie.mm(jnp.swapaxes(self.ref_R, -1, -2), R))

    def residual_jac_x(self, st, cache, x, u, ft_of):
        R = cache.frame_placement(self.fid).R
        w = lie.log3(lie.mm(jnp.swapaxes(self.ref_R, -1, -2), R))
        ft = ft_of(self.fid)
        return (ft.dxi[:, 3:] @ lie.jac_so3_right_inv(w).T).T


class CostFrameVelocity(Cost):
    """r = v_frame(LOCAL) − vref (multibody/costs/frame-velocity.hxx)."""

    fid: int = struct.field(pytree_node=False, default=0)
    vref: jax.Array = None

    def residual(self, st, cache, x, u):
        return cache.frame_velocity(self.fid) - self.vref

    def residual_jac_x(self, st, cache, x, u, ft_of):
        return ft_of(self.fid).dv.T


class CostContactForce(Cost):
    """r = λ_contact − fref in the contact frame
    (multibody/costs/contact-force.hxx; 3D → linear part only)."""

    contact_idx: int = struct.field(pytree_node=False, default=0)
    fref: jax.Array = None  # (3,) or (6,)

    def residual(self, st, cache, x, u):
        f = cache.contact_force(self.contact_idx)  # (3,) or (6,)
        n = self.fref.shape[-1]
        return f[:n] - self.fref

    def residual_jac_x(self, st, cache, x, u, ft_of):
        # pure force dependence: the (dr/dlam)·dlam chain is added by the
        # node; the kinematic part is exactly zero
        return jnp.zeros((self.fref.shape[-1], st.ndx), x.dtype)


class CostContactFrictionCone(Cost):
    """r = A_cone · f_lin with barrier activation
    (multibody/costs/contact-friction-cone.hxx)."""

    contact_idx: int = struct.field(pytree_node=False, default=0)
    cone: FrictionCone = None

    def residual(self, st, cache, x, u):
        f = cache.contact_force(self.contact_idx)
        return lie.mv(self.cone.A, f[:3])

    def residual_jac_x(self, st, cache, x, u, ft_of):
        return jnp.zeros((self.cone.A.shape[0], st.ndx), x.dtype)


class CostContactCoP(Cost):
    """r = A_cop · f6 with [0, ∞) barrier — the fork's CoP-constrained-DDP
    contribution (multibody/costs/contact-cop-position.hxx:47-88)."""

    contact_idx: int = struct.field(pytree_node=False, default=0)
    support: CoPSupport = None

    def residual(self, st, cache, x, u):
        f = cache.contact_force(self.contact_idx)
        f6 = f if f.shape[-1] == 6 else jnp.concatenate(
            [f, jnp.zeros((3,), f.dtype)])
        return lie.mv(self.support.A, f6)

    def residual_jac_x(self, st, cache, x, u, ft_of):
        return jnp.zeros((4, st.ndx), x.dtype)


class CostCentroidalMomentum(Cost):
    """r = A(q)·v − href (multibody/costs/centroidal-momentum.hxx)."""

    href: jax.Array = None

    def residual(self, st, cache, x, u):
        return cache.kin.centroidal_momentum() - self.href

    def residual_jac_x(self, st, cache, x, u, ft_of):
        # dh in GEMM form: dh_w/dq_d = Σ_i[d⪯i](CF(I_i v_i)S_d − I_i cw_d),
        # dh_w/dv_d = (Σ_i[d⪯i] I_i)S_d; then the centroidal correction
        # ang −= com × lin chains through Jcom (same identities as
        # gforce_derivatives; pinned in tests/test_costs_numdiff.py).
        from ...dynamics import algorithms as algo
        from ...dynamics.spatial import cross_motion
        kin = cache.kin
        model = kin.model
        S = kin.Jcols
        nv = S.shape[0]
        amask = kin.amask
        Iw = kin.I_w.to_matrix()
        vw = kin.vel_w
        h2 = kin.I_w.mul_motion(vw)
        parents = jnp.asarray(
            [0 if p == -1 else p for p in model.parents])
        not_root = jnp.asarray(
            [0.0 if p == -1 else 1.0 for p in model.parents], x.dtype)
        import numpy as _np
        dofj = jnp.asarray(_np.asarray(
            algo._meta(model)[4]))
        wv = (vw[parents] * not_root[:, None])[dofj]
        cw = cross_motion(S, wv)
        # masked body sums per dof
        CFh2 = algo._CF(h2)
        A1 = jnp.einsum("id,iab->dab", amask, CFh2)      # (nv, 6, 6)
        AI = jnp.einsum("id,iab->dab", amask, Iw)
        dh_q = (jnp.einsum("dab,db->da", A1, S)
                - jnp.einsum("dab,db->da", AI, cw))      # (nv, 6)
        dh_v = jnp.einsum("dab,db->da", AI, S)
        # centroidal correction: ang' = ang − com × lin
        hw = kin.oMi.act_force(
            algo.Inertia(m=model.mass, c=model.com,
                         I_c=model.inertia).mul_motion(kin.vels))
        hsum = jnp.sum(hw, axis=0)
        lin = hsum[:3]
        com = kin.com()
        m_ = model.mass
        msub = jnp.einsum("ie,i->e", amask, m_)
        csub = jnp.einsum("ie,i,ic->ec", amask, m_, kin.I_w.c)
        mtot = jnp.sum(m_)
        dcom_q = (msub[:, None] * S[:, :3]
                  + jnp.cross(S[:, 3:], csub)) / mtot     # (nv, 3)

        def correct(dh, dcom):
            dlin = dh[:, :3]
            dang = (dh[:, 3:] - jnp.cross(dcom, lin[None])
                    - jnp.cross(com[None], dlin))
            return jnp.concatenate([dlin, dang], axis=1)

        Rq = correct(dh_q, dcom_q)
        Rv = correct(dh_v, jnp.zeros((nv, 3), x.dtype))
        return jnp.concatenate([Rq, Rv], axis=0).T        # (6, ndx)


class CostImpulseCoM(Cost):
    """r = Jcom·(v⁺−v⁻) — CoM velocity change at impact
    (multibody/costs/impulse-com.hxx)."""

    def residual(self, st, cache, x, u):
        return cache.kin.com_velocity(cache.vnext - cache.v)


class CostContactImpulse(CostContactForce):
    """r = Λ − Λref on an ImpulseNode (multibody/costs/contact-impulse.hxx).
    Identical residual to CostContactForce: the node's cache.forces hold the
    impulse multipliers Λ at impact nodes."""


class CostImpulseFrictionCone(CostContactFrictionCone):
    """Friction cone on the impulse Λ
    (multibody/costs/impulse-friction-cone.hxx); same residual machinery as
    the contact-force cone applied to an ImpulseNode's forces."""


def cost_nr(cost: Cost, st) -> int:
    """Static residual size of a cost item."""
    if isinstance(cost, CostState):
        return st.ndx
    if isinstance(cost, CostControl):
        return cost.uref.shape[-1]
    if isinstance(cost, (CostCoM, CostFrameTranslation, CostFrameRotation,
                         CostImpulseCoM)):
        return 3
    if isinstance(cost, (CostFramePlacement, CostFrameVelocity,
                         CostCentroidalMomentum)):
        return 6
    if isinstance(cost, CostContactForce):
        return cost.fref.shape[-1]
    if isinstance(cost, CostContactFrictionCone):
        return cost.cone.A.shape[0]
    if isinstance(cost, CostContactCoP):
        return 4
    raise NotImplementedError(type(cost))
