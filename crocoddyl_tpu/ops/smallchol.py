"""Unrolled batched Cholesky + triangular solves for tiny matrices.

XLA's `cholesky`/`triangular_solve` custom-calls pad robot-scale operands
(nv≈12-36) to (8,128) tiles and loop over columns — they showed up as ~6%
of device time in the solve profile despite trivial FLOPs.  Unrolling over
a STATIC n turns the factorization into full-lane batched VPU ops with no
padding and no column loop.

The unroll is COLUMN-VECTORIZED, not scalar: each of the n steps is a
handful of (..., n)- or (..., n, m)-shaped ops (one masked column of the
Cholesky–Crout recurrence / one row of the substitution), so the traced
graph is O(n) equations instead of the O(n³) scalar unroll — keeping
XLA compile time flat — while every op still runs across the whole batch.
Negative pivots produce NaN through sqrt (same failure signal as
lax.linalg.cholesky), which the solver's escalation logic consumes.

Used for n ≤ MAX_UNROLL; larger n falls back to jnp.linalg.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

MAX_UNROLL = 40


def chol(M):
    """Lower Cholesky factor of (..., n, n) PD matrices (batched, unrolled
    column-by-column)."""
    n = M.shape[-1]
    if n > MAX_UNROLL:
        return jnp.linalg.cholesky(M)
    dt = M.dtype
    cols = []
    for j in range(n):
        s = M[..., :, j]
        if cols:
            prev = jnp.stack(cols, axis=-1)          # (..., n, j)
            rowj = prev[..., j, :]                   # (..., j)
            s = s - jnp.sum(prev * rowj[..., None, :], axis=-1)
        d = jnp.sqrt(s[..., j])
        col = s / d[..., None]
        mask = jnp.asarray((np.arange(n) > j).astype(np.float64), dt)
        col = col * mask                             # strict lower part
        col = col + d[..., None] * jnp.asarray(np.arange(n) == j, dt)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


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
        if xs:
            X = jnp.stack(xs, axis=-2)               # (..., i, m)
            s = s - jnp.sum(L[..., i, :i, None] * X, axis=-2)
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
    xs = []
    for i in reversed(range(n)):
        s = bb[..., i, :]
        if xs:
            # xs holds rows n-1 … i+1 (reverse order); match with the
            # reversed column slice of L
            X = jnp.stack(xs, axis=-2)               # (..., n-1-i, m)
            Lcol = L[..., i + 1:, i][..., ::-1, None]
            s = s - jnp.sum(Lcol * X, axis=-2)
        xs.append(s / L[..., i, i, None])
    x = jnp.stack(xs[::-1], axis=-2)
    return x[..., 0] if vec else x


def cho_solve(L, b):
    """A⁻¹ b from the lower Cholesky factor L of A."""
    return solve_upper_t(L, solve_lower(L, b))


def pd_solve(M, b):
    """M⁻¹ b for PD M (unrolled chol + two substitutions)."""
    return cho_solve(chol(M), b)


def solve_upper_t_nr(L, b):
    """Gather-free variant of solve_upper_t for use INSIDE Pallas kernels
    (2-D operands only): mixed ellipsis/int indexing lowers to gather ops
    that Mosaic cannot compile, so every access is CHAINED single-axis
    indexing (L[k][i]), which lowers to static slice+squeeze.  Same math;
    summation order differs from solve_upper_t in the last ulp, so the
    general solver path keeps the original (golden-trace stability)."""
    n = L.shape[-1]
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    rows = [None] * n
    for i in reversed(range(n)):
        s = bb[i]
        terms = [L[k][i] * rows[k] for k in range(i + 1, n)]
        if terms:
            s = s - sum(terms)
        rows[i] = s / L[i][i]
    x = jnp.stack(rows, axis=0)
    return x[:, 0] if vec else x


def solve_lower_nr(L, b):
    """Gather-free forward substitution (see solve_upper_t_nr; 2-D only)."""
    n = L.shape[-1]
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    rows = []
    for i in range(n):
        s = bb[i]
        terms = [L[i][k] * rows[k] for k in range(i)]
        if terms:
            s = s - sum(terms)
        rows.append(s / L[i][i])
    x = jnp.stack(rows, axis=0)
    return x[:, 0] if vec else x


def cho_solve_nr(L, b):
    """Gather-free cho_solve (Pallas-kernel variant, 2-D operands)."""
    return solve_upper_t_nr(L, solve_lower_nr(L, b))
