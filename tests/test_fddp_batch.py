"""Batch-native FDDP (core/solvers/fddp_batch.py) vs vmap(fddp.solve).

The batch-native path re-lays the SAME solver out with problems on the
lane axis of the Pallas kernels; in exact arithmetic it makes identical
decisions (accepted steps, reg schedule, iteration counts).  These tests
pin that equivalence in f64 on CPU through the pure-XLA lane fallbacks
(the Pallas grid kernels are exercised on TPU by the bench lane)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.solvers import fddp_batch


@pytest.fixture(scope="module")
def walk_small():
    from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
    from crocoddyl_tpu.dynamics import robots
    m = robots.anymal(dtype=np.float64)
    q0 = robots.anymal_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    prob = fac.walking_problem(x0, 0.25, 0.15, 1e-2,
                               step_knots=3, support_knots=1)
    xs0 = jnp.tile(prob.x0[None], (prob.T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    B = 3
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, m.nv))
    x0s = jnp.tile(x0[None], (B, 1)).at[:, prob.state.nq:].add(dv)
    return prob, xs0, us0, x0s


@pytest.mark.parametrize("maxiter", [
    1, pytest.param(8, marks=pytest.mark.slow)])
def test_matches_vmapped_solve(walk_small, maxiter):
    prob, xs0, us0, x0s = walk_small
    st_ = ct.SolverSettings(maxiter=maxiter, record_trace=False,
                            parallel_linesearch=False)
    assert fddp_batch.supports(prob, st_)
    ref = jax.jit(jax.vmap(lambda xi: ct.solve(
        prob.replace(x0=xi), xs_init=xs0, us_init=us0,
        settings=st_)))(x0s)
    out = fddp_batch.solve_batch(prob, x0s, xs_init=xs0, us_init=us0,
                                 settings=st_)
    np.testing.assert_array_equal(np.asarray(ref.iter),
                                  np.asarray(out.iter))
    np.testing.assert_array_equal(np.asarray(ref.steplength),
                                  np.asarray(out.steplength))
    np.testing.assert_allclose(np.asarray(ref.cost), np.asarray(out.cost),
                               rtol=1e-8)
    du = float(jnp.max(jnp.abs(ref.us - out.us)))
    assert du < 1e-6, du


def test_unsupported_configs_gate(walk_small):
    prob, *_ = walk_small
    assert not fddp_batch.supports(
        prob, ct.SolverSettings(box=True))
    assert not fddp_batch.supports(
        prob, ct.SolverSettings(parallel_linesearch=True))
    assert not fddp_batch.supports(
        prob, ct.SolverSettings(record_trace=True))
