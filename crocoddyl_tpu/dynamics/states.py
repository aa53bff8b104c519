"""Multibody state manifold x = (q, v) over a RobotModel.

Reference: include/crocoddyl/multibody/states/multibody.hxx — ⊖/⊕ delegate to
pinocchio difference/integrate on q (free-flyer = SE(3) log/exp in the body
frame) and plain vector ops on v; Jacobians via dDifference/dIntegrate.

All ops are fully vectorized closed forms (no per-joint Python loop, no AD):
models built by ModelBuilder have at most one free-flyer and it is joint 0,
so q = [p(3), quat(4), θ₁..θₖ] and the manifold is SE(3) × Rᵏ.  The
jdiff/jintegrate Jacobians are identity except the 6×6 free-flyer block,
which uses the closed-form SE(3) right Jacobian / its inverse / the adjoint
(lie.jac_se3_right{,_inv}, lie.se3_adjoint) — the same forms pinocchio's
dIntegrate/dDifference produce (multibody.hxx:94-144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.manifolds import StateBase
from . import lie
from .model import JointType, RobotModel
from .spatial import Transform


class StateMultibody(StateBase):
    model: RobotModel

    @property
    def nq(self) -> int:
        return self.model.nq

    @property
    def nv(self) -> int:
        return self.model.nv

    @property
    def nx(self) -> int:
        return self.model.nq + self.model.nv

    @property
    def ndx(self) -> int:
        return 2 * self.model.nv

    def zero(self) -> jax.Array:
        return jnp.concatenate([self.model.neutral(),
                                jnp.zeros((self.nv,), self.model.jp_p.dtype)])

    def rand(self, key) -> jax.Array:
        kq, kv = jax.random.split(key)
        q = self.model.random_q(kq)
        v = jax.random.uniform(kv, (self.nv,), q.dtype, -1.0, 1.0)
        return jnp.concatenate([q, v])

    # ------------------------------------------------------------------
    @property
    def has_ff(self) -> bool:
        return JointType(self.model.joint_types[0]) == JointType.FREE_FLYER

    def _ff_transform(self, q) -> Transform:
        return Transform(lie.quat_to_rot(q[..., 3:7]), q[..., :3])

    def _q_diff(self, q0, q1):
        if not self.has_ff:
            return q1 - q0
        M01 = self._ff_transform(q0).inverse().compose(self._ff_transform(q1))
        return jnp.concatenate(
            [lie.log6(M01.R, M01.p), q1[..., 7:] - q0[..., 7:]], axis=-1)

    def _q_integrate(self, q, dq):
        if not self.has_ff:
            return q + dq
        dR, dp = lie.exp6(dq[..., :6])
        Mn = self._ff_transform(q).compose(Transform(dR, dp))
        qn = lie.quat_normalize(lie.rot_to_quat(Mn.R))
        return jnp.concatenate([Mn.p, qn, q[..., 7:] + dq[..., 6:]], axis=-1)

    def diff(self, x0, x1):
        nq = self.nq
        dq = self._q_diff(x0[..., :nq], x1[..., :nq])
        return jnp.concatenate([dq, x1[..., nq:] - x0[..., nq:]], axis=-1)

    def integrate(self, x, dx):
        nq, nv = self.nq, self.nv
        qn = self._q_integrate(x[..., :nq], dx[..., :nv])
        return jnp.concatenate([qn, x[..., nq:] + dx[..., nv:]], axis=-1)

    # -- closed-form Jacobians (multibody.hxx:94-144) ----------------------
    def _embed_ff(self, block6, diag_val: float):
        """(ndx, ndx) matrix = diag(diag_val) with the top-left 6×6 block
        replaced (free-flyer tangent block)."""
        dt = block6.dtype
        J = diag_val * jnp.eye(self.ndx, dtype=dt)
        return J.at[:6, :6].set(block6)

    def jdiff(self, x0, x1):
        dt = jnp.result_type(x0, x1)
        if not self.has_ff:
            eye = jnp.eye(self.ndx, dtype=dt)
            return -eye, eye
        nq = self.nq
        M0 = self._ff_transform(x0[:nq])
        M1 = self._ff_transform(x1[:nq])
        D = M0.inverse().compose(M1)
        d = lie.log6(D.R, D.p)
        Jri = lie.jac_se3_right_inv(d)
        Dinv = D.inverse()
        # first: log6((M0 exp δ)⁻¹ M1) = log6(D exp(−Ad(D⁻¹)δ))
        J0 = self._embed_ff(-Jri @ lie.se3_adjoint(Dinv.R, Dinv.p), -1.0)
        J1 = self._embed_ff(Jri, 1.0)
        return J0, J1

    def jintegrate(self, x, dx):
        dt = jnp.result_type(x, dx)
        if not self.has_ff:
            eye = jnp.eye(self.ndx, dtype=dt)
            return eye, eye
        xi = dx[:6]
        eR, ep = lie.exp6(-xi)
        Jx = self._embed_ff(lie.se3_adjoint(eR, ep), 1.0)   # Ad(exp ξ)⁻¹
        Jdx = self._embed_ff(lie.jac_se3_right(xi), 1.0)
        return Jx, Jdx

    def jintegrate_transport(self, x, dx, jac, firstsecond: str = "first"):
        """Left-multiply ``jac`` by the Jintegrate block — only the 6
        free-flyer rows change, so this is a 6×6 × 6×m product, not a full
        (ndx, ndx) matmul."""
        if not self.has_ff:
            return jac
        xi = dx[:6]
        if firstsecond == "first":
            eR, ep = lie.exp6(-xi)
            blk = lie.se3_adjoint(eR, ep)
        else:
            blk = lie.jac_se3_right(xi)
        return jac.at[:6].set(blk @ jac[:6])
