"""Contact and impulse models with fixed-shape activity masks.

Reference: multibody/contacts/contact-3d.hxx (Baumgarte-stabilized point
contact), contact-6d.hxx (placement contact), multiple-contacts.hxx (ordered
stack with active/inactive status), impulses/* (impulse variants).

TPU-native design: the contact stack has a STATIC maximal set of contacts;
per-node 0/1 ``active`` masks replace crocoddyl's changeContactStatus.  An
inactive contact contributes zeroed Jacobian rows and a unit diagonal in the
KKT lower-right block, which forces its multiplier to exactly zero — one
static shape covers every gait phase.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...dynamics import lie
from ...dynamics.spatial import Transform
from ...ops import smallchol as _sc
# NOTE: since the analytic node-linearization (nodes.py:_tangent_outputs),
# the contact KKT runs OUTSIDE any jacfwd region (factorizations are primal;
# all tangent directions are back-substituted through them), so the unrolled
# smallchol kernels are safe and replace the loopy cholesky/triangular_solve
# custom-calls that dominated the primal node cost.  (Historically they were
# avoided here: under the old 48-tangent fused-AD path they defeated XLA's
# rematerialization and blew past HBM at benchmark batch sizes.)


class Contact3D(struct.PyTreeNode):
    """Point contact: a0 = a_lin + ω×v_lin + Kp·(p−pref) + Kv·v_lin
    (contact-3d.hxx:25-44; the Kp term uses the WORLD translation error,
    matching the reference)."""

    fid: int = struct.field(pytree_node=False)
    pref: jax.Array = None      # (3,) world reference translation
    gains: jax.Array = None     # (2,) Baumgarte (Kp, Kv)
    active: jax.Array = None    # 0/1

    @property
    def nc(self) -> int:
        return 3

    def calc(self, cache):
        J = cache.frame_jacobian_local(self.fid)[:3]
        vf = cache.frame_velocity(self.fid)
        vv, vw = vf[:3], vf[3:]
        ab = cache.frame_bias_acc(self.fid)
        a0 = ab[:3] + jnp.cross(vw, vv)
        oMf = cache.frame_placement(self.fid)
        a0 = a0 + self.gains[0] * (oMf.p - self.pref)
        a0 = a0 + self.gains[1] * vv
        return J, a0

    def calc_impulse(self, cache):
        J = cache.frame_jacobian_local(self.fid)[:3]
        return J

    def calc_tangent(self, cache, ft):
        """Closed-form d(−(Jc·a + a0))/dx (ndx, 3) from the frame tangents
        (algorithms.frame_tangents); matches the reference's analytic
        da0_dx chain (contact-3d.hxx:47-72)."""
        vf = cache.frame_velocity(self.fid)
        vv, vw = vf[:3], vf[3:]
        dvv, dvw = ft.dv[:, :3], ft.dv[:, 3:]
        da0 = (ft.dab[:, :3] + jnp.cross(dvw, vv[None])
               + jnp.cross(vw[None], dvv)
               + self.gains[0] * ft.dp + self.gains[1] * dvv)
        return -(ft.dJa[:, :3] + da0)


class Contact6D(struct.PyTreeNode):
    """Placement contact: a0 = a_spatial + Kp·log6(Mref⁻¹·oMf) + Kv·v
    (contact-6d.hxx:39-66)."""

    fid: int = struct.field(pytree_node=False)
    ref_R: jax.Array = None
    ref_p: jax.Array = None
    gains: jax.Array = None
    active: jax.Array = None

    @property
    def nc(self) -> int:
        return 6

    def calc(self, cache):
        J = cache.frame_jacobian_local(self.fid)
        vf = cache.frame_velocity(self.fid)
        ab = cache.frame_bias_acc(self.fid)
        oMf = cache.frame_placement(self.fid)
        rMf = Transform(self.ref_R, self.ref_p).inverse().compose(oMf)
        a0 = ab + self.gains[0] * lie.log6(rMf.R, rMf.p) + self.gains[1] * vf
        return J, a0

    def calc_impulse(self, cache):
        return cache.frame_jacobian_local(self.fid)

    def calc_tangent(self, cache, ft):
        """Closed-form d(−(Jc·a + a0))/dx (ndx, 6): the log6 term chains
        through Jlog6 applied to the placement's local twist tangent
        (contact-6d.hxx:39-66 Jlog6 derivative)."""
        oMf = cache.frame_placement(self.fid)
        rMf = Transform(self.ref_R, self.ref_p).inverse().compose(oMf)
        xi = lie.log6(rMf.R, rMf.p)
        Jr_inv = lie.jac_se3_right_inv(xi)
        dlog = ft.dxi @ Jr_inv.T
        da0 = ft.dab + self.gains[0] * dlog + self.gains[1] * ft.dv
        return -(ft.dJa + da0)


class ContactSet(struct.PyTreeNode):
    """Static tuple of contacts; stacks masked (Jc, a0)
    (multiple-contacts.hxx:24-150)."""

    contacts: Tuple = struct.field(default_factory=tuple)

    @property
    def nc(self) -> int:
        return sum(c.nc for c in self.contacts)

    def slices(self):
        out, i = [], 0
        for c in self.contacts:
            out.append((i, c.nc))
            i += c.nc
        return out

    def calc(self, cache):
        """Masked stacked (Jc (nc, nv), a0 (nc,), active_rows (nc,))."""
        Js, a0s, masks = [], [], []
        for c in self.contacts:
            J, a0 = c.calc(cache)
            m = c.active
            Js.append(J * m)
            a0s.append(a0 * m)
            masks.append(jnp.broadcast_to(m, (c.nc,)))
        return (jnp.concatenate(Js, axis=0), jnp.concatenate(a0s, axis=0),
                jnp.concatenate(masks, axis=0))

    def calc_impulse(self, cache):
        Js, masks = [], []
        for c in self.contacts:
            J = c.calc_impulse(cache)
            m = c.active
            Js.append(J * m)
            masks.append(jnp.broadcast_to(m, (c.nc,)))
        return jnp.concatenate(Js, axis=0), jnp.concatenate(masks, axis=0)

    def calc_tangents(self, kin, cache, a):
        """Closed-form d(r2)/dx (ndx, nc) of the stacked masked contact
        vector r2 = −(Jc·a + a0) — replaces sweep-linearization of the
        contact stack in the node derivative path."""
        from ...dynamics import algorithms as algo
        outs = []
        for c in self.contacts:
            ft = algo.frame_tangents(kin, a, c.fid)
            outs.append(c.calc_tangent(cache, ft) * c.active)
        return jnp.concatenate(outs, axis=1)


def _contact_kkt_raw(M, Jc, a0_neg_rhs, tau_minus_b, mask, damping):
    dt = M.dtype
    nc = Jc.shape[0]
    Lm = _sc.chol(M)
    # X = M⁻¹ [Jᵀ | τ−b]
    rhs = jnp.concatenate([Jc.T, tau_minus_b[:, None]], axis=1)
    X = _sc.cho_solve(Lm, rhs)
    MinvJT, a_free = X[:, :nc], X[:, nc]
    # S λ = −(J·M⁻¹(τ−b) + a0)   with S = J M⁻¹ Jᵀ + damping·I (masked)
    S = Jc @ MinvJT + damping * jnp.eye(nc, dtype=dt)
    S = S * (mask[:, None] * mask[None, :]) + jnp.diag(1.0 - mask)
    b_lam = -(Jc @ a_free + a0_neg_rhs) * mask
    Ls = _sc.chol(S)
    lam = _sc.cho_solve(Ls, b_lam)
    a = a_free + MinvJT @ lam
    return a, lam, Lm, Ls, MinvJT


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_jvp, nondiff_argnums=(5,))
def solve_contact_kkt(M, Jc, a0_neg_rhs, tau_minus_b, mask, damping=0.0):
    """Solve [M Jᵀ; J −damping·I][a; −λ] = [τ−b; −a0]
    (pinocchio::forwardDynamics used in contact-fwddyn.hxx:77-99).

    TPU-native path: Schur complement on the (PD) mass matrix via two
    Cholesky factorizations instead of a pivoted LU of the indefinite KKT —
    batched `cholesky`/`triangular_solve` map onto the TPU without the
    sequential pivoting of LU.  Inactive rows (mask 0) get a unit diagonal in
    the Schur complement so λ=0 there exactly.  Returns (a, lam (nc,),
    chol(M)).

    Differentiation is IMPLICIT (custom JVP): the tangent solves the same
    KKT with the primal factorizations reused — the TPU analogue of the
    reference's getKKTContactDynamicMatrixInverse derivative path
    (contact-fwddyn.hxx:126-159).  Under jacfwd the tangent RHS is batched
    over the 48-ish directions while the factorizations stay unbatched.
    """
    a, lam, Lm, _, _ = _contact_kkt_raw(M, Jc, a0_neg_rhs, tau_minus_b,
                                        mask, damping)
    return a, lam, Lm


@solve_contact_kkt.defjvp
def _solve_contact_kkt_jvp(damping, primals, tangents):
    M, Jc, a0, taumb, mask = primals
    dM, dJc, da0, dtaumb, _ = tangents
    a, lam, Lm, Ls, MinvJT = _contact_kkt_raw(M, Jc, a0, taumb, mask, damping)

    def z(t, like):
        return (jnp.zeros_like(like)
                if isinstance(t, jax.custom_derivatives.SymbolicZero) else t)

    dM, dJc = z(dM, M), z(dJc, Jc)
    da0, dtaumb = z(da0, a0), z(dtaumb, taumb)
    # KKT differential at fixed (a, λ):
    #   M·da − Jᵀ·dλ = r1 := dτ−db − dM·a + dJᵀ·λ
    #   J·da + damping·dλ = r2 := −da0 − dJ·a   ⇒   S·dλ = r2 − J·M⁻¹·r1
    r1 = dtaumb - dM @ a + dJc.T @ lam
    r2 = -(da0 + dJc @ a)
    Minv_r1 = _sc.cho_solve(Lm, r1)
    dlam = _sc.cho_solve(Ls, (r2 - Jc @ Minv_r1) * mask)
    da = Minv_r1 + MinvJT @ dlam
    return (a, lam, Lm), (da, dlam, jnp.zeros_like(Lm))


@jax.custom_jvp
def pd_solve(M, rhs):
    """a = M⁻¹·rhs for PD M via Cholesky, with an implicit-diff JVP that
    reuses the factorization: da = M⁻¹(drhs − dM·a) — one vector backsolve
    per tangent instead of the Cholesky-differential path."""
    return _sc.cho_solve(_sc.chol(M), rhs)


@pd_solve.defjvp
def _pd_solve_jvp(primals, tangents):
    M, rhs = primals
    dM, drhs = tangents
    L = _sc.chol(M)
    a = _sc.cho_solve(L, rhs)

    def z(t, like):
        return (jnp.zeros_like(like)
                if isinstance(t, jax.custom_derivatives.SymbolicZero) else t)

    da = _sc.cho_solve(L, z(drhs, rhs) - z(dM, M) @ a)
    return a, da
