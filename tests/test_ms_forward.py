"""Multiple-shooting (chunk-parallel) forward pass.

With one chunk covering the whole horizon the MS rollout must equal the
sequential reference rollout bit-for-bit in exact arithmetic (the first
chunk starts from integrate(xs[0], fs[0]) = x0).  With small chunks the
solver must still converge on the unicycle to the same solution, the
chunk-boundary defects being absorbed as FDDP gaps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crocoddyl_tpu.core.action import replicate_model
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers import fddp
from crocoddyl_tpu.models.unicycle import UnicycleModel


def _problem(T=30):
    m = UnicycleModel(dt=jnp.asarray(0.1), cost_weights=jnp.asarray([10., 1.]))
    x0 = jnp.asarray([-1.0, -1.0, 1.0])
    return ShootingProblem(x0=x0, running=replicate_model(m, T), terminal=m)


def test_single_chunk_matches_sequential():
    prob = _problem()
    T = prob.T
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(prob.x0[None], (T + 1, 1)) \
        + 0.1 * jax.random.normal(key, (T + 1, 3))
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, 2))
    k = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (T, 2))
    K = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (T, 2, 3))
    # gaps as the solver would compute them (infeasible candidate)
    derivs, dterm, fs, _ = fddp._calc_diff(prob, xs, us, jnp.zeros((), bool))

    for alpha in (1.0, 0.5):
        a = jnp.asarray(alpha)
        ref = fddp._forward_pass(prob, xs, us, k, K, fs, a)
        got = fddp._forward_pass_ms(prob, xs, us, k, K, fs, a, ms_chunk=T)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-12)


def test_chunked_rollout_shapes_and_start_states():
    prob = _problem(T=29)  # 29 = 4*7 + 1 remainder chunk
    T = prob.T
    xs = jnp.tile(prob.x0[None], (T + 1, 1))
    us = jnp.zeros((T, 2))
    zk = jnp.zeros((T, 2))
    zK = jnp.zeros((T, 2, 3))
    fs = jnp.zeros((T + 1, 3))
    xs_try, us_try, cost, failed = fddp._forward_pass_ms(
        prob, xs, us, zk, zK, fs, jnp.asarray(1.0), ms_chunk=7)
    assert xs_try.shape == (T + 1, 3) and us_try.shape == (T, 2)
    assert not bool(failed)


def test_ms_solver_converges_like_sequential():
    """MS-appropriate tolerances: chunk-boundary defects put an O(gap)
    noise floor under Qu, so th_stop is meaningfully looser than the exact
    sequential solver's 1e-9 while the solution itself matches."""
    prob = _problem(T=40)
    base = fddp.solve(prob, settings=fddp.SolverSettings(
        maxiter=60, record_trace=False))
    ms = fddp.solve(prob, settings=fddp.SolverSettings(
        maxiter=60, record_trace=False, ms_chunk=8,
        th_stop=1e-3, th_gaptol=1e-4))
    assert bool(base.converged)
    assert bool(ms.converged)
    assert float(jnp.max(jnp.abs(ms.fs))) < 1e-3
    np.testing.assert_allclose(float(ms.cost), float(base.cost),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ms.us), np.asarray(base.us),
                               atol=1e-2)
