"""Action-model protocol (TPU-native analogue of crocoddyl's ActionModelAbstract).

Reference: include/crocoddyl/core/action-base.hpp:24-142.  A crocoddyl action
model is ``calc`` (one-step dynamics + cost) and ``calcDiff`` (first/second
derivatives in tangent coordinates, filled into a per-node Data struct).  Here
both are pure functions on immutable pytree dataclasses; "Data" becomes the
returned :class:`NodeDerivs` pytree, so the solver hot loop is allocation-free
under jit.

Models carry their parameters as array fields (pytree leaves), so a length-T
heterogeneous-parameter problem is just the same model dataclass with a leading
T axis on every leaf (see :func:`stack_models`) — the vmap analogue of
crocoddyl's per-node model list, and the OpenMP loop in
``ShootingProblem::calc[Diff]`` (reference: core/optctrl/shooting.hxx:143-178)
becomes a ``jax.vmap`` over that axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .manifolds import StateBase


class NodeDerivs(struct.PyTreeNode):
    """Per-node derivative block in tangent coordinates.

    Mirrors ActionDataAbstract{Fx,Fu,Lx,Lu,Lxx,Lxu,Luu}
    (reference: core/action-base.hpp:207-239).
    """

    Fx: jax.Array   # (ndx, ndx)
    Fu: jax.Array   # (ndx, nu)
    Lx: jax.Array   # (ndx,)
    Lu: jax.Array   # (nu,)
    Lxx: jax.Array  # (ndx, ndx)
    Lxu: jax.Array  # (ndx, nu)
    Luu: jax.Array  # (nu, nu)


class ActionModel(struct.PyTreeNode):
    """One discrete OCP node: xnext = f(x, u), cost = l(x, u)."""

    @property
    def state(self) -> StateBase:
        raise NotImplementedError

    @property
    def nu(self) -> int:
        raise NotImplementedError

    def calc(self, x: jax.Array, u: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Return (xnext, cost)."""
        raise NotImplementedError

    def calc_terminal(self, x: jax.Array) -> jax.Array:
        """Terminal cost only (reference calls calc(data, x) with u=0)."""
        u = jnp.zeros((self.nu,), dtype=jnp.result_type(x))
        return self.calc(x, u)[1]

    # ------------------------------------------------------------------
    # Default derivatives via AD in tangent coordinates.  Subclasses with
    # closed forms (unicycle, LQR) override for speed and to match the
    # reference's Gauss-Newton Hessian convention where applicable.
    # ------------------------------------------------------------------
    def calc_diff(self, x: jax.Array, u: jax.Array) -> NodeDerivs:
        st = self.state
        dt = jnp.result_type(x)
        z_dx = jnp.zeros((st.ndx,), dtype=dt)
        z_du = jnp.zeros((self.nu,), dtype=dt)
        xnext0, _ = self.calc(x, u)

        def f_tan(dx, du):
            xn, _ = self.calc(st.integrate(x, dx), u + du)
            return st.diff(xnext0, xn)

        def l_tan(dx, du):
            _, c = self.calc(st.integrate(x, dx), u + du)
            return c

        Fx = jax.jacfwd(f_tan, 0)(z_dx, z_du)
        Fu = jax.jacfwd(f_tan, 1)(z_dx, z_du)
        Lx = jax.grad(l_tan, 0)(z_dx, z_du)
        Lu = jax.grad(l_tan, 1)(z_dx, z_du)
        Lxx = jax.jacfwd(jax.grad(l_tan, 0), 0)(z_dx, z_du)
        Lxu = jax.jacfwd(jax.grad(l_tan, 0), 1)(z_dx, z_du)
        Luu = jax.jacfwd(jax.grad(l_tan, 1), 1)(z_dx, z_du)
        return NodeDerivs(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu)

    def calc_diff_terminal(self, x: jax.Array) -> NodeDerivs:
        u = jnp.zeros((self.nu,), dtype=jnp.result_type(x))
        return self.calc_diff(x, u)

    def calc_both(self, x: jax.Array, u: jax.Array):
        """(NodeDerivs, xnext, cost) — calc + calc_diff in one pass.
        Default composes the two; dynamics-heavy nodes override with a
        single fused evaluation."""
        xnext, cost = self.calc(x, u)
        return self.calc_diff(x, u), xnext, cost

    def quasi_static(self, x: jax.Array, maxiter: int = 10) -> jax.Array:
        """Control keeping the state steady; default zero (overridden by
        dynamics-aware models; reference: core/action-base.hpp quasiStatic)."""
        return jnp.zeros((self.nu,), dtype=jnp.result_type(x))


def stack_models(models) -> "ActionModel":
    """Stack a list of same-structure models into one with a leading T axis."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *models)


def replicate_model(model: ActionModel, T: int) -> "ActionModel":
    """Broadcast one model's params to a leading T axis."""
    return jax.tree.map(lambda leaf: jnp.broadcast_to(leaf, (T,) + jnp.shape(leaf)), model)
