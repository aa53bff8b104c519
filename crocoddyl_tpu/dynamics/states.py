"""Multibody state manifold x = (q, v) over a RobotModel.

Reference: include/crocoddyl/multibody/states/multibody.hxx — ⊖/⊕ delegate to
pinocchio difference/integrate on q (free-flyer = SE(3) log/exp in the body
frame) and plain vector ops on v; Jacobians via dDifference/dIntegrate.  Here
the Jacobians come from the AD defaults in :class:`StateBase` (exact by
construction); closed forms can override later for speed.
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
    def _q_diff(self, q0, q1):
        m = self.model
        parts = []
        for jid, ((qi, nq), (vi, nv)) in enumerate(zip(m.q_slices(),
                                                       m.v_slices())):
            jt = JointType(m.joint_types[jid])
            q0j, q1j = q0[qi:qi + nq], q1[qi:qi + nq]
            if jt == JointType.FREE_FLYER:
                R0, p0 = lie.quat_to_rot(q0j[3:]), q0j[:3]
                R1, p1 = lie.quat_to_rot(q1j[3:]), q1j[:3]
                M01 = Transform(R0, p0).inverse().compose(Transform(R1, p1))
                parts.append(lie.log6(M01.R, M01.p))
            else:
                parts.append(q1j - q0j)
        return jnp.concatenate(parts)

    def _q_integrate(self, q, dq):
        m = self.model
        parts = []
        for jid, ((qi, nq), (vi, nv)) in enumerate(zip(m.q_slices(),
                                                       m.v_slices())):
            jt = JointType(m.joint_types[jid])
            qj, dqj = q[qi:qi + nq], dq[vi:vi + nv]
            if jt == JointType.FREE_FLYER:
                R, p = lie.quat_to_rot(qj[3:]), qj[:3]
                dR, dp = lie.exp6(dqj)
                Mn = Transform(R, p).compose(Transform(dR, dp))
                qn = lie.quat_normalize(lie.rot_to_quat(Mn.R))
                parts.append(jnp.concatenate([Mn.p, qn]))
            else:
                parts.append(qj + dqj)
        return jnp.concatenate(parts)

    def diff(self, x0, x1):
        nq = self.nq
        dq = self._q_diff(x0[:nq], x1[:nq])
        return jnp.concatenate([dq, x1[nq:] - x0[nq:]])

    def integrate(self, x, dx):
        nq, nv = self.nq, self.nv
        qn = self._q_integrate(x[:nq], dx[:nv])
        return jnp.concatenate([qn, x[nq:] + dx[nv:]])
