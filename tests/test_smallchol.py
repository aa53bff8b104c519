"""Unrolled tiny-matrix Cholesky/solve kernels vs jnp.linalg references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.ops import smallchol as sc


@pytest.mark.parametrize("n", [1, 3, 12, 18, 36])
def test_chol_matches_reference(n):
    key = jax.random.PRNGKey(n)
    A = jax.random.normal(key, (5, n, n))
    M = A @ jnp.swapaxes(A, -1, -2) + n * jnp.eye(n)
    np.testing.assert_allclose(np.asarray(sc.chol(M)),
                               np.asarray(jnp.linalg.cholesky(M)),
                               atol=1e-12)


@pytest.mark.parametrize("n", [3, 12, 18])
def test_cho_solve_matches_reference(n):
    key = jax.random.PRNGKey(n)
    A = jax.random.normal(key, (4, n, n))
    M = A @ jnp.swapaxes(A, -1, -2) + n * jnp.eye(n)
    L = sc.chol(M)
    b = jax.random.normal(key, (4, n))
    B = jax.random.normal(key, (4, n, 3))
    np.testing.assert_allclose(
        np.asarray(sc.cho_solve(L, b)),
        np.asarray(jnp.linalg.solve(M, b[..., None])[..., 0]), atol=1e-11)
    np.testing.assert_allclose(np.asarray(sc.cho_solve(L, B)),
                               np.asarray(jnp.linalg.solve(M, B)), atol=1e-11)


def test_non_pd_produces_nan():
    """Failure signal matches lax.linalg.cholesky: NaN, no exception —
    consumed by the solver's regularization escalation."""
    M = jnp.asarray([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    L = sc.chol(M)
    assert bool(jnp.isnan(L).any())


def test_grad_through_chol():
    """The unrolled form is plain jnp ops — AD just works (used under the
    solver's jacfwd paths)."""
    def f(m):
        M = m @ m.T + 3 * jnp.eye(3)
        return sc.pd_solve(M, jnp.ones(3)).sum()
    g = jax.grad(f)(jnp.eye(3) * 0.5)
    gr = jax.grad(lambda m: jnp.linalg.solve(
        m @ m.T + 3 * jnp.eye(3), jnp.ones(3)).sum())(jnp.eye(3) * 0.5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-10)
