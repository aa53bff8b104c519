"""Actuation models: u ↦ generalized torque τ(x, u).

Reference: core/actuation-base.hpp, multibody/actuations/{full,floating-base,
multicopter-base}.hpp, core/actuation/squashing/smooth-sat.hpp and
core/actuation/actuation-squashing.hpp.  Derivatives flow through node-level
AD, so models only define the forward map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class Actuation(struct.PyTreeNode):
    nv: int = struct.field(pytree_node=False)

    @property
    def nu(self) -> int:
        raise NotImplementedError

    def calc(self, x, u):
        """Return τ (nv,)."""
        raise NotImplementedError


class FullActuation(Actuation):
    """τ = u (multibody/actuations/full.hpp)."""

    @property
    def nu(self) -> int:
        return self.nv

    def calc(self, x, u):
        return u


class FloatingBaseActuation(Actuation):
    """τ = [0₆; u] — underactuated free-flyer base
    (multibody/actuations/floating-base.hpp:33-41)."""

    @property
    def nu(self) -> int:
        return self.nv - 6

    def calc(self, x, u):
        return jnp.concatenate([jnp.zeros((6,), u.dtype), u])


class MultiCopterBaseActuation(Actuation):
    """τ = [tau_f·u_rotors ; u_joints] (multibody/actuations/
    multicopter-base.hpp, Geisert & Mansard ICRA'16).  ``tau_f`` is the
    (6, n_rotors) thrust map."""

    tau_f: jax.Array

    @property
    def n_rotors(self) -> int:
        return self.tau_f.shape[-1]

    @property
    def nu(self) -> int:
        return self.n_rotors + (self.nv - 6)

    def calc(self, x, u):
        base = self.tau_f @ u[:self.n_rotors]
        return jnp.concatenate([base, u[self.n_rotors:]])


class SmoothSatSquashing(struct.PyTreeNode):
    """s(u) = ½(lb+ub+√(β²+(u−lb)²)−√(β²+(u−ub)²))
    (core/actuation/squashing/smooth-sat.hpp:51)."""

    s_lb: jax.Array
    s_ub: jax.Array
    smooth: jax.Array  # the reference's smooth factor (default 0.1)

    def calc(self, u):
        d = self.smooth * (self.s_ub - self.s_lb)
        a = d * d
        return 0.5 * (self.s_lb + self.s_ub
                      + jnp.sqrt(a + (u - self.s_lb) ** 2)
                      - jnp.sqrt(a + (u - self.s_ub) ** 2))


class SquashingActuation(Actuation):
    """Chains squashing into an actuation: τ = act(x, s(u))
    (core/actuation/actuation-squashing.hpp:43-53)."""

    actuation: Actuation
    squashing: SmoothSatSquashing

    @property
    def nu(self) -> int:
        return self.actuation.nu

    def calc(self, x, u):
        return self.actuation.calc(x, self.squashing.calc(u))
