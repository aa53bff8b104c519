"""BoxQP tests — mirror of the reference's unittest/test_boxqp.cpp intent."""

import jax
import jax.numpy as jnp
import numpy as np

from crocoddyl_tpu.core.solvers import boxqp


def _rand_qp(key, n):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (n, n))
    H = A @ A.T + n * jnp.eye(n)
    q = jax.random.normal(k2, (n,))
    return H, q


def test_unconstrained_interior():
    H, q = _rand_qp(jax.random.PRNGKey(0), 5)
    lb, ub = jnp.full((5,), -1e6), jnp.full((5,), 1e6)
    sol = boxqp.solve(H, q, lb, ub, jnp.zeros(5))
    np.testing.assert_allclose(np.asarray(sol.x),
                               np.linalg.solve(np.asarray(H), -np.asarray(q)),
                               atol=1e-8)
    assert bool(sol.free.all())
    assert not bool(sol.failed)


def test_kkt_conditions_with_active_bounds():
    H, q = _rand_qp(jax.random.PRNGKey(1), 6)
    lb, ub = jnp.full((6,), -0.1), jnp.full((6,), 0.1)
    sol = boxqp.solve(H, q, lb, ub, jnp.zeros(6))
    x = np.asarray(sol.x)
    g = np.asarray(H) @ x + np.asarray(q)
    assert (x >= -0.1 - 1e-12).all() and (x <= 0.1 + 1e-12).all()
    for i in range(6):
        if abs(x[i] - 0.1) < 1e-12:
            assert g[i] <= 1e-8      # at upper bound: gradient pushes up
        elif abs(x[i] + 0.1) < 1e-12:
            assert g[i] >= -1e-8     # at lower bound: gradient pushes down
        else:
            assert abs(g[i]) <= 1e-6  # free: stationary


def test_hff_inv_free_block():
    H, q = _rand_qp(jax.random.PRNGKey(2), 4)
    lb, ub = jnp.full((4,), -0.05), jnp.full((4,), 0.05)
    sol = boxqp.solve(H, q, lb, ub, jnp.zeros(4))
    free = np.asarray(sol.free)
    Hff_inv = np.asarray(sol.Hff_inv)
    if free.any():
        Hff = np.asarray(H)[np.ix_(free, free)]
        np.testing.assert_allclose(Hff_inv[np.ix_(free, free)],
                                   np.linalg.inv(Hff), atol=1e-8)
    # clamped rows/cols zero
    assert np.abs(Hff_inv[~free]).max(initial=0.0) == 0.0


def test_batched_vmap():
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    Hs, qs = jax.vmap(lambda k: _rand_qp(k, 5))(keys)
    lb, ub = jnp.full((5,), -0.2), jnp.full((5,), 0.2)
    sols = jax.vmap(lambda H, q: boxqp.solve(H, q, lb, ub, jnp.zeros(5)))(Hs, qs)
    assert sols.x.shape == (8, 5)
    assert not bool(sols.failed.any())
    for i in range(8):
        solo = boxqp.solve(Hs[i], qs[i], lb, ub, jnp.zeros(5))
        np.testing.assert_allclose(np.asarray(sols.x[i]), np.asarray(solo.x),
                                   atol=1e-10)
