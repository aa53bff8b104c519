"""Projected-Newton box-constrained QP: min ½xᵀHx + qᵀx  s.t. lb ≤ x ≤ ub.

Reference: src/core/solvers/box-qp.cpp:51-182.  Active-set detection by
gradient sign at the bounds, Newton step on the free subspace via Cholesky,
Armijo backtracking with projection (10 halving steps).

TPU-native design: the reference's dynamic index sets (free_idx/clamped_idx
std::vectors) become fixed-shape boolean masks; the free-subspace system
Hff·dxf = rhs becomes the full-size masked system
(F·H·F + diag(clamped))·dz = F·rhs, which has the same solution on the free
coordinates and zeros elsewhere — so the whole solve is fixed-shape, jittable
and batchable with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class BoxQPSolution(struct.PyTreeNode):
    """Mirrors BoxQPSolution (box-qp.hpp): x, free/clamped sets, Hff⁻¹.

    ``Hff_inv`` here is the full-size matrix with the free-block inverse
    scattered in and zeros on clamped rows/cols — exactly the Quu_inv_ layout
    SolverBoxDDP builds from it (box-ddp.cpp:60-66).
    """

    x: jax.Array         # (n,)
    free: jax.Array      # (n,) bool
    Hff_inv: jax.Array   # (n, n)
    failed: jax.Array    # bool — Cholesky failure (reference throws)
    iterations: jax.Array


def _masked_system(H, free, reg, dtype):
    n = H.shape[-1]
    Fo = jnp.outer(free, free)
    A = jnp.where(Fo, H, jnp.zeros_like(H))
    A = A + jnp.diag(jnp.where(free, jnp.asarray(reg, dtype), jnp.asarray(1.0, dtype)))
    return A


def solve(H: jax.Array, q: jax.Array, lb: jax.Array, ub: jax.Array,
          xinit: jax.Array, maxiter: int = 100, th_acceptstep: float = 0.1,
          th_grad: float = 1e-9, reg: float = 0.0,
          n_alphas: int = 10) -> BoxQPSolution:
    """Fixed-shape jittable BoxQP solve (defaults per box-qp.hpp:92)."""
    dtype = jnp.result_type(H)
    n = H.shape[-1]
    alphas = jnp.asarray([2.0 ** (-k) for k in range(n_alphas)], dtype)
    x0 = jnp.clip(xinit, lb, ub)

    def sets(x):
        g = q + H @ x
        clamped = ((x == lb) & (g > 0)) | ((x == ub) & (g < 0))
        return g, ~clamped

    def cond(carry):
        _, it, done, _ = carry
        return (it < maxiter) & ~done

    def body(carry):
        x, it, done, failed = carry
        g, free = sets(x)
        conv = (jnp.max(jnp.abs(g)) <= th_grad) | ~free.any()

        A = _masked_system(H, free, reg, dtype)
        chol = jnp.linalg.cholesky(A)
        failed = failed | jnp.isnan(chol).any()
        rhs = jnp.where(free, -(q + H @ jnp.where(free, jnp.zeros_like(x), x)),
                        jnp.zeros_like(x))
        dz = jax.scipy.linalg.cho_solve((chol, True), rhs)
        dx = jnp.where(free, dz - x, jnp.zeros_like(x))

        fold = 0.5 * x @ (H @ x) + q @ x

        def trial(alpha):
            xnew = jnp.clip(x + alpha * dx, lb, ub)
            fnew = 0.5 * xnew @ (H @ xnew) + q @ xnew
            return xnew, fold - fnew > th_acceptstep * (g @ (x - xnew))

        xnews, ok = jax.vmap(trial)(alphas)
        any_ok = ok.any()
        idx = jnp.argmax(ok)
        xnew = jnp.where(any_ok, xnews[idx], x)

        x_out = jnp.where(conv | done, x, xnew)
        return x_out, it + 1, done | conv | failed, failed

    x, it, _, failed = jax.lax.while_loop(
        cond, body, (x0, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                     jnp.zeros((), bool)))

    # Final sets + free-block inverse for the caller (BoxDDP gains).
    g, free = sets(x)
    A = _masked_system(H, free, reg, dtype)
    chol = jnp.linalg.cholesky(A)
    failed = failed | jnp.isnan(chol).any()
    Ainv = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(n, dtype=dtype))
    Hff_inv = jnp.where(jnp.outer(free, free), Ainv, jnp.zeros_like(Ainv))
    return BoxQPSolution(x=x, free=free, Hff_inv=Hff_inv, failed=failed,
                         iterations=it)
