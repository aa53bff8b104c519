"""Unicycle action model.

Reference: include/crocoddyl/core/actions/unicycle.hxx:20-73 — state (x, y, θ),
controls (v, ω), dynamics xnext = x + [cosθ·v·dt, sinθ·v·dt, ω·dt], residual
r = [w0·x, w1·u] and cost ½‖r‖², with default dt=0.1, w=(10, 1).  The
reference's closed-form calcDiff is reproduced exactly (Gauss-Newton: the cost
Hessian keeps only wᵢ² diagonals and Fx keeps only the dynamics terms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.action import ActionModel, NodeDerivs
from ..core.manifolds import StateVector


class UnicycleModel(ActionModel):
    dt: jax.Array = struct.field(default_factory=lambda: jnp.asarray(0.1))
    cost_weights: jax.Array = struct.field(
        default_factory=lambda: jnp.asarray([10.0, 1.0]))

    @property
    def state(self) -> StateVector:
        return StateVector(nx_=3)

    @property
    def nu(self) -> int:
        return 2

    def calc(self, x, u):
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        xnext = jnp.stack([
            x[0] + c * u[0] * self.dt,
            x[1] + s * u[0] * self.dt,
            x[2] + u[1] * self.dt,
        ])
        w0, w1 = self.cost_weights[0], self.cost_weights[1]
        r = jnp.concatenate([w0 * x, w1 * u])
        cost = 0.5 * jnp.dot(r, r)
        return xnext, cost

    def calc_terminal(self, x):
        w0 = self.cost_weights[0]
        r = w0 * x
        return 0.5 * jnp.dot(r, r)

    def calc_diff(self, x, u) -> NodeDerivs:
        dt_ = jnp.result_type(x)
        w_x = (self.cost_weights[0] ** 2).astype(dt_)
        w_u = (self.cost_weights[1] ** 2).astype(dt_)
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        Lx = w_x * x
        Lu = w_u * u
        Lxx = w_x * jnp.eye(3, dtype=dt_)
        Luu = w_u * jnp.eye(2, dtype=dt_)
        Lxu = jnp.zeros((3, 2), dtype=dt_)
        Fx = jnp.eye(3, dtype=dt_)
        Fx = Fx.at[0, 2].set(-s * u[0] * self.dt)
        Fx = Fx.at[1, 2].set(c * u[0] * self.dt)
        Fu = jnp.zeros((3, 2), dtype=dt_)
        Fu = Fu.at[0, 0].set(c * self.dt)
        Fu = Fu.at[1, 0].set(s * self.dt)
        Fu = Fu.at[2, 1].set(self.dt)
        return NodeDerivs(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu)

    def calc_diff_terminal(self, x) -> NodeDerivs:
        dt_ = jnp.result_type(x)
        w_x = (self.cost_weights[0] ** 2).astype(dt_)
        return NodeDerivs(
            Fx=jnp.eye(3, dtype=dt_),
            Fu=jnp.zeros((3, 2), dtype=dt_),
            Lx=w_x * x,
            Lu=jnp.zeros((2,), dtype=dt_),
            Lxx=w_x * jnp.eye(3, dtype=dt_),
            Lxu=jnp.zeros((3, 2), dtype=dt_),
            Luu=jnp.zeros((2, 2), dtype=dt_),
        )
