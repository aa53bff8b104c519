"""Unrolled batched Cholesky + triangular solves for tiny matrices.

XLA's `cholesky`/`triangular_solve` custom-calls pad robot-scale operands
(nv≈12-36) to (8,128) tiles and loop over columns — they showed up as ~6%
of device time in the solve profile despite trivial FLOPs.  For a tiny
STATIC n, unrolling the Cholesky–Banachiewicz recurrence over scalar index
pairs turns the factorization into ~n²/2 elementwise ops over the batch —
every op is a full-lane (B·T)-vector operation on the VPU, no padding, no
column loop.  Negative pivots produce NaN through sqrt (same failure signal
as lax.linalg.cholesky), which the solver's escalation logic consumes.

Used for n ≤ MAX_UNROLL; larger n falls back to jnp.linalg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_UNROLL = 40


def chol(M):
    """Lower Cholesky factor of (..., n, n) PD matrices (batched, unrolled)."""
    n = M.shape[-1]
    if n > MAX_UNROLL:
        return jnp.linalg.cholesky(M)
    # L as an n×n list of (...)-shaped blocks
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    z = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else z for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def solve_lower(L, b):
    """x with L x = b for lower-triangular L: (..., n, n) @ (..., n[, m])."""
    n = L.shape[-1]
    if n > MAX_UNROLL:
        return jax.scipy.linalg.solve_triangular(L, b, lower=True)
    vec = b.ndim == L.ndim - 1
    bb = b[..., None] if vec else b
    xs = []
    for i in range(n):
        s = bb[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * xs[k]
        xs.append(s / L[..., i, i, None])
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def solve_upper_t(L, b):
    """x with Lᵀ x = b for lower-triangular L (back substitution)."""
    n = L.shape[-1]
    if n > MAX_UNROLL:
        return jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1)
    vec = b.ndim == L.ndim - 1
    bb = b[..., None] if vec else b
    xs = [None] * n
    for i in reversed(range(n)):
        s = bb[..., i, :]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * xs[k]
        xs[i] = s / L[..., i, i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def cho_solve(L, b):
    """A⁻¹ b from the lower Cholesky factor L of A."""
    return solve_upper_t(L, solve_lower(L, b))


def pd_solve(M, b):
    """M⁻¹ b for PD M (unrolled chol + two substitutions)."""
    return cho_solve(chol(M), b)
