"""State-manifold abstractions (TPU-native analogue of crocoddyl's StateAbstract).

The reference defines states as manifolds with ``diff`` (x1 ⊖ x0), ``integrate``
(x ⊕ dx), their Jacobians and a parallel-transport helper
(reference: include/crocoddyl/core/state-base.hpp:44-292).  Here a state is an
immutable pytree dataclass whose methods are pure jax functions, usable under
``jit``/``vmap``/``scan``.  All Jacobians are dense ``(ndx, ndx)`` arrays in
tangent coordinates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class StateBase(struct.PyTreeNode):
    """Common interface. Subclasses define nx/ndx and the manifold ops."""

    # -- dims -------------------------------------------------------------
    @property
    def nx(self) -> int:
        raise NotImplementedError

    @property
    def ndx(self) -> int:
        raise NotImplementedError

    # -- ops --------------------------------------------------------------
    def zero(self) -> jax.Array:
        raise NotImplementedError

    def rand(self, key) -> jax.Array:
        raise NotImplementedError

    def diff(self, x0: jax.Array, x1: jax.Array) -> jax.Array:
        """Tangent vector from x0 to x1 (x1 ⊖ x0)."""
        raise NotImplementedError

    def integrate(self, x: jax.Array, dx: jax.Array) -> jax.Array:
        """Retraction x ⊕ dx."""
        raise NotImplementedError

    def jdiff(self, x0, x1) -> Tuple[jax.Array, jax.Array]:
        """Jacobians of diff(x0, x1) wrt tangent perturbations of (x0, x1)."""
        d0 = jax.jacfwd(lambda h: self.diff(self.integrate(x0, h), x1))(
            jnp.zeros((self.ndx,), dtype=jnp.result_type(x0)))
        d1 = jax.jacfwd(lambda h: self.diff(x0, self.integrate(x1, h)))(
            jnp.zeros((self.ndx,), dtype=jnp.result_type(x1)))
        return d0, d1

    def jintegrate(self, x, dx) -> Tuple[jax.Array, jax.Array]:
        """Jacobians of integrate(x, dx) wrt tangent x and wrt dx."""
        jx = jax.jacfwd(
            lambda h: self.diff(self.integrate(x, dx), self.integrate(self.integrate(x, h), dx))
        )(jnp.zeros((self.ndx,), dtype=jnp.result_type(x)))
        jdx = jax.jacfwd(
            lambda h: self.diff(self.integrate(x, dx), self.integrate(x, dx + h))
        )(jnp.zeros((self.ndx,), dtype=jnp.result_type(dx)))
        return jx, jdx

    def jintegrate_transport(self, x, dx, jac, firstsecond: str = "first") -> jax.Array:
        """Parallel-transport ``jac`` through the integrate map (left-multiply
        by Jintegrate component; reference: state-base.hpp JintegrateTransport)."""
        jx, jdx = self.jintegrate(x, dx)
        j = jx if firstsecond == "first" else jdx
        return j @ jac


class StateVector(StateBase):
    """Euclidean state in R^nx (reference: core/states/euclidean.hpp)."""

    nx_: int = struct.field(pytree_node=False)
    lb: jax.Array | None = None
    ub: jax.Array | None = None

    @property
    def nx(self) -> int:
        return self.nx_

    @property
    def ndx(self) -> int:
        return self.nx_

    def zero(self) -> jax.Array:
        return jnp.zeros((self.nx_,))

    def rand(self, key) -> jax.Array:
        return jax.random.uniform(key, (self.nx_,), minval=-1.0, maxval=1.0)

    def diff(self, x0, x1):
        return x1 - x0

    def integrate(self, x, dx):
        return x + dx

    def jdiff(self, x0, x1):
        dt = jnp.result_type(x0, x1)
        eye = jnp.eye(self.nx_, dtype=dt)
        return -eye, eye

    def jintegrate(self, x, dx):
        dt = jnp.result_type(x, dx)
        eye = jnp.eye(self.nx_, dtype=dt)
        return eye, eye

    def jintegrate_transport(self, x, dx, jac, firstsecond: str = "first"):
        return jac


def state_vector(nx: int) -> StateVector:
    return StateVector(nx_=nx)
