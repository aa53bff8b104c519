"""Discrete LQR action model (test model).

Reference: include/crocoddyl/core/actions/lqr.hxx — dynamics
xnext = Fx·x + Fu·u (+ f0 unless drift-free), cost
½xᵀLxx x + ½uᵀLuu u + xᵀLxu u + lxᵀx + luᵀu; defaults are identity/ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.action import ActionModel, NodeDerivs
from ..core.manifolds import StateVector


class LQRModel(ActionModel):
    Fx: jax.Array
    Fu: jax.Array
    f0: jax.Array
    Lxx: jax.Array
    Lxu: jax.Array
    Luu: jax.Array
    lx: jax.Array
    lu: jax.Array

    @property
    def state(self) -> StateVector:
        return StateVector(nx_=self.Fx.shape[-1])

    @property
    def nu(self) -> int:
        return self.Fu.shape[-1]

    def calc(self, x, u):
        xnext = self.Fx @ x + self.Fu @ u + self.f0
        cost = (0.5 * x @ (self.Lxx @ x) + 0.5 * u @ (self.Luu @ u)
                + x @ (self.Lxu @ u) + self.lx @ x + self.lu @ u)
        return xnext, cost

    def calc_terminal(self, x):
        u = jnp.zeros((self.nu,), dtype=jnp.result_type(x))
        return self.calc(x, u)[1]

    def calc_diff(self, x, u) -> NodeDerivs:
        return NodeDerivs(
            Fx=self.Fx,
            Fu=self.Fu,
            Lx=self.lx + self.Lxx @ x + self.Lxu @ u,
            Lu=self.lu + self.Lxu.T @ x + self.Luu @ u,
            Lxx=self.Lxx,
            Lxu=self.Lxu,
            Luu=self.Luu,
        )

    def calc_diff_terminal(self, x) -> NodeDerivs:
        u = jnp.zeros((self.nu,), dtype=jnp.result_type(x))
        return self.calc_diff(x, u)


def lqr_model(nx: int, nu: int, drift_free: bool = False, dtype=jnp.float64) -> LQRModel:
    """Defaults mirror the reference constructor (lqr.hxx:14-26)."""
    return LQRModel(
        Fx=jnp.eye(nx, dtype=dtype),
        Fu=jnp.eye(nx, nu, dtype=dtype),
        f0=jnp.zeros((nx,), dtype=dtype) if drift_free else jnp.ones((nx,), dtype=dtype),
        Lxx=jnp.eye(nx, dtype=dtype),
        Lxu=jnp.eye(nx, nu, dtype=dtype),
        Luu=jnp.eye(nu, dtype=dtype),
        lx=jnp.ones((nx,), dtype=dtype),
        lu=jnp.ones((nu,), dtype=dtype),
    )


class DiffLQRModel(ActionModel):
    """Continuous-time LQR fused with semi-implicit Euler integration.

    Reference: include/crocoddyl/core/actions/diff-lqr.hxx:46-80 —
    acceleration v̇ = Fq·q + Fv·v + Fu·u (+ f0 unless drift-free) with the
    quadratic cost RATE ½xᵀLxx x + ½uᵀLuu u + xᵀLxu u + lxᵀx + luᵀu,
    discretized per IntegratedActionModelEuler (euler.hxx:41-131):
    dx = [v·dt + a·dt²; a·dt], cost·dt, dt=0 ⇒ terminal node.
    """

    Fq: jax.Array
    Fv: jax.Array
    Fu_: jax.Array
    f0: jax.Array
    Lxx: jax.Array
    Lxu: jax.Array
    Luu: jax.Array
    lx: jax.Array
    lu: jax.Array
    dt: jax.Array = None

    @property
    def nq(self) -> int:
        return self.Fq.shape[-1]

    @property
    def state(self) -> StateVector:
        return StateVector(nx_=2 * self.Fq.shape[-1])

    @property
    def nu(self) -> int:
        return self.Fu_.shape[-1]

    def _xout(self, x, u):
        nq = self.nq
        return self.Fq @ x[:nq] + self.Fv @ x[nq:] + self.Fu_ @ u + self.f0

    def _cost_rate(self, x, u):
        return (0.5 * x @ (self.Lxx @ x) + 0.5 * u @ (self.Luu @ u)
                + x @ (self.Lxu @ u) + self.lx @ x + self.lu @ u)

    def calc(self, x, u):
        nq = self.nq
        a = self._xout(x, u)
        v = x[nq:]
        dt = self.dt
        dx = jnp.concatenate([v * dt + a * dt * dt, a * dt])
        is_term = dt == 0.0
        xnext = jnp.where(is_term, x, x + dx)
        cost = jnp.where(is_term, self._cost_rate(x, u),
                         dt * self._cost_rate(x, u))
        return xnext, cost

    def calc_diff(self, x, u) -> NodeDerivs:
        nq = self.nq
        dtt = jnp.result_type(x)
        dt = self.dt
        # da/dx = [Fq Fv]; Euler chain rule (euler.hxx:103-121, Euclidean)
        da_dx = jnp.concatenate([self.Fq, self.Fv], axis=1)
        dv_dx = jnp.concatenate(
            [jnp.zeros((nq, nq), dtt), jnp.eye(nq, dtype=dtt)], axis=1)
        Fx_i = jnp.eye(2 * nq, dtype=dtt) + jnp.concatenate(
            [dt * dv_dx + dt * dt * da_dx, dt * da_dx], axis=0)
        Fu_i = jnp.concatenate(
            [dt * dt * self.Fu_, dt * self.Fu_], axis=0)
        is_term = dt == 0.0
        scale = jnp.where(is_term, 1.0, dt)
        Lx = self.lx + self.Lxx @ x + self.Lxu @ u
        Lu = self.lu + self.Lxu.T @ x + self.Luu @ u
        return NodeDerivs(
            Fx=jnp.where(is_term, jnp.eye(2 * nq, dtype=dtt), Fx_i),
            Fu=jnp.where(is_term, jnp.zeros_like(Fu_i), Fu_i),
            Lx=scale * Lx, Lu=scale * Lu, Lxx=scale * self.Lxx,
            Lxu=scale * self.Lxu, Luu=scale * self.Luu)

    def calc_diff_terminal(self, x) -> NodeDerivs:
        u = jnp.zeros((self.nu,), dtype=jnp.result_type(x))
        return self.calc_diff(x, u)


def diff_lqr_model(nq: int, nu: int, dt: float = 0.1,
                   drift_free: bool = False, dtype=jnp.float64) -> DiffLQRModel:
    """Defaults mirror the reference constructor (diff-lqr.hxx:15-28)."""
    return DiffLQRModel(
        Fq=jnp.eye(nq, dtype=dtype), Fv=jnp.eye(nq, dtype=dtype),
        Fu_=jnp.eye(nq, nu, dtype=dtype),
        f0=(jnp.zeros if drift_free else jnp.ones)((nq,), dtype=dtype),
        Lxx=jnp.eye(2 * nq, dtype=dtype),
        Lxu=jnp.eye(2 * nq, nu, dtype=dtype),
        Luu=jnp.eye(nu, dtype=dtype),
        lx=jnp.ones((2 * nq,), dtype=dtype),
        lu=jnp.ones((nu,), dtype=dtype),
        dt=jnp.asarray(dt, dtype))


def random_lqr_model(key, nx: int, nu: int, dtype=jnp.float64) -> LQRModel:
    """A random well-conditioned LQR instance for tests."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    Fx = 0.9 * jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(k1, (nx, nx), dtype=dtype)
    Fu = jax.random.normal(k2, (nx, nu), dtype=dtype)
    H = jax.random.normal(k3, (nx + nu, nx + nu), dtype=dtype)
    H = H @ H.T + (nx + nu) * jnp.eye(nx + nu, dtype=dtype)
    return LQRModel(
        Fx=Fx, Fu=Fu, f0=0.1 * jax.random.normal(k4, (nx,), dtype=dtype),
        Lxx=H[:nx, :nx], Lxu=H[:nx, nx:], Luu=H[nx:, nx:],
        lx=jax.random.normal(k5, (nx,), dtype=dtype),
        lu=jax.random.normal(k6, (nu,), dtype=dtype),
    )
