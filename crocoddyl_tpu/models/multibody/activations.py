"""Activation models: r ↦ a(r) with gradient Ar and diagonal Hessian Arr.

Reference: include/crocoddyl/core/activations/*.hpp and
core/activation-base.hpp:23-74.  Each activation is a pytree dataclass with a
single ``calc(r) -> (a_value, Ar, Arr_diag)`` pure function; the Gauss-Newton
cost assembly consumes (Ar, Arr_diag) exactly as the reference's CostModel
does (multibody/cost-base: Lxx = Rxᵀ·Arr·Rx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class Activation(struct.PyTreeNode):
    def calc(self, r):
        """Return (a_value, Ar, Arr_diag)."""
        raise NotImplementedError


class ActivationQuad(Activation):
    """a = ½‖r‖² (core/activations/quadratic.hpp)."""

    def calc(self, r):
        return 0.5 * jnp.dot(r, r), r, jnp.ones_like(r)


class ActivationWeightedQuad(Activation):
    """a = ½ rᵀW r, W diagonal (core/activations/weighted-quadratic.hpp:38-62)."""

    weights: jax.Array

    def calc(self, r):
        wr = self.weights * r
        return 0.5 * jnp.dot(r, wr), wr, self.weights


class ActivationSmoothAbs(Activation):
    """a = Σ √(r²+1)  (core/activations/smooth-abs.hpp)."""

    def calc(self, r):
        s = jnp.sqrt(r * r + 1.0)
        return jnp.sum(s), r / s, 1.0 / (s * s * s)


def make_bounds(lb, ub, beta: float = 1.0):
    """ActivationBounds with the reference's beta shrink
    (quadratic-barrier.hpp:53-58): bounds pulled toward the center by beta."""
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    m = 0.5 * (lb + ub)
    d = 0.5 * (ub - lb)
    # keep infinite bounds infinite (m/d would be nan): only shrink where finite
    finite = jnp.isfinite(lb) & jnp.isfinite(ub)
    lb_s = jnp.where(finite, m - beta * d, lb)
    ub_s = jnp.where(finite, m + beta * d, ub)
    return lb_s, ub_s


class ActivationQuadraticBarrier(Activation):
    """a = ½‖(r−ub)⁺‖² + ½‖(r−lb)⁻‖² (core/activations/quadratic-barrier.hpp)."""

    lb: jax.Array
    ub: jax.Array

    def calc(self, r):
        rlb = jnp.minimum(r - self.lb, 0.0)
        rub = jnp.maximum(r - self.ub, 0.0)
        a = 0.5 * jnp.dot(rlb, rlb) + 0.5 * jnp.dot(rub, rub)
        Ar = rlb + rub
        active = ((r - self.lb) <= 0.0) | ((r - self.ub) >= 0.0)
        return a, Ar, active.astype(r.dtype)


class ActivationWeightedQuadraticBarrier(Activation):
    """Barrier with per-component weights
    (core/activations/weighted-quadratic-barrier.hpp)."""

    lb: jax.Array
    ub: jax.Array
    weights: jax.Array

    def calc(self, r):
        rlb = jnp.minimum(r - self.lb, 0.0)
        rub = jnp.maximum(r - self.ub, 0.0)
        rb = rlb + rub
        wrb = self.weights * rb
        a = 0.5 * jnp.dot(rb, wrb)
        active = ((r - self.lb) <= 0.0) | ((r - self.ub) >= 0.0)
        return a, wrb, self.weights * active.astype(r.dtype)
