"""Shooting problem container.

Reference: include/crocoddyl/core/optctrl/shooting.hpp:31-223.  The reference
holds T heterogeneous model pointers + preallocated Datas and loops (OpenMP)
over nodes in ``calc``/``calcDiff``; rollout is sequential.  Here the running
horizon is ONE model dataclass whose array leaves carry a leading T axis
(per-node parameters), so node evaluation is a ``jax.vmap`` over T — the exact
TPU analogue of the OpenMP node loop — and the rollout is a ``lax.scan``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .action import ActionModel, NodeDerivs


class ShootingProblem(struct.PyTreeNode):
    x0: jax.Array
    running: ActionModel   # array leaves have leading T axis
    terminal: ActionModel

    @property
    def T(self) -> int:
        return jax.tree.leaves(self.running)[0].shape[0]

    @property
    def state(self):
        return self.terminal.state

    @property
    def nu(self) -> int:
        return self.terminal.nu if hasattr(self.terminal, "nu") else 0

    # ------------------------------------------------------------------
    def calc(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Evaluate every node at the given trajectory.

        Returns (xnexts (T, nx), costs (T+1,)) — costs[T] is the terminal
        cost.  Mirrors ShootingProblem::calc (shooting.hxx:133-161).
        """
        xnexts, costs = jax.vmap(lambda m, x, u: m.calc(x, u))(
            self.running, xs[:-1], us)
        cterm = self.terminal.calc_terminal(xs[-1])
        return xnexts, jnp.concatenate([costs, cterm[None]])

    def calc_diff(self, xs: jax.Array, us: jax.Array) -> Tuple[NodeDerivs, NodeDerivs]:
        """Derivatives of every node, stacked over T, plus terminal derivs.

        Mirrors ShootingProblem::calcDiff (shooting.hxx:163-196).
        """
        derivs = jax.vmap(lambda m, x, u: m.calc_diff(x, u))(
            self.running, xs[:-1], us)
        dterm = self.terminal.calc_diff_terminal(xs[-1])
        return derivs, dterm

    def rollout(self, us: jax.Array) -> jax.Array:
        """Sequential open-loop rollout from x0 (shooting.hxx rollout)."""

        def step(x, mu):
            m, u = mu
            xn, _ = m.calc(x, u)
            return xn, x

        xT, xs = jax.lax.scan(step, self.x0, (self.running, us))
        return jnp.concatenate([xs, xT[None]], axis=0)

    def quasi_static(self, xs: jax.Array) -> jax.Array:
        return jax.vmap(lambda m, x: m.quasi_static(x))(self.running, xs[:-1])
