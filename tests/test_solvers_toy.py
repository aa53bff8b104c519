"""DDP/FDDP on analytic toy models, cross-validated against the NumPy oracle.

Reference test pattern: unittest/bindings/test_solvers.py (C++ solver vs
pure-Python Derived oracle at tight tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.core.action import replicate_model
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers.fddp import (
    SolverSettings, ddp_settings, fddp_settings, solve)
from crocoddyl_tpu.models.lqr import lqr_model, random_lqr_model
from crocoddyl_tpu.models.unicycle import UnicycleModel

from .oracle import lqr_oracle, unicycle_oracle

T = 20
X0 = [-1.0, -1.0, 1.0]


def unicycle_problem():
    m = UnicycleModel()
    return ShootingProblem(x0=jnp.asarray(X0), running=replicate_model(m, T),
                           terminal=m)


@pytest.mark.parametrize("fd", [True, False], ids=["fddp", "ddp"])
def test_unicycle_matches_oracle(fd):
    prob = unicycle_problem()
    settings = SolverSettings(maxiter=30, feasibility_driven=fd)
    sol = solve(prob, settings=settings)

    oracle = unicycle_oracle(np.asarray(X0), T, feasibility_driven=fd)
    ok = oracle.solve(maxiter=30)

    assert bool(sol.converged) == ok
    assert int(sol.iter) == oracle.iter
    np.testing.assert_allclose(np.asarray(sol.cost), oracle.cost, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.xs), oracle.xs, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.us), oracle.us, atol=1e-6)
    # iteration trace parity (CallbackVerbose columns).  Early iterations can
    # deviate at ~1e-7 relative: last-bit differences between cho_solve and
    # LU amplify through the closed-loop trial rollout.
    for i, row in enumerate(oracle.trace):
        np.testing.assert_allclose(np.asarray(sol.trace.cost[i]), row["cost"],
                                   rtol=5e-7)
        np.testing.assert_allclose(np.asarray(sol.trace.steplength[i]),
                                   row["steplength"], rtol=1e-12)


def test_unicycle_warm_start_feasible():
    prob = unicycle_problem()
    us = jnp.zeros((T, 2))
    xs = prob.rollout(us)
    sol = solve(prob, xs_init=xs, us_init=us,
                settings=SolverSettings(maxiter=30), is_feasible=True)
    assert bool(sol.converged)
    assert bool(sol.is_feasible)


def test_lqr_converges_fast():
    nx, nu = 6, 3
    m = lqr_model(nx, nu)
    prob = ShootingProblem(x0=jnp.ones((nx,)), running=replicate_model(m, 10),
                           terminal=m)
    sol = solve(prob, settings=ddp_settings(maxiter=10))
    assert bool(sol.converged)
    # LQR is solved by one full Newton step + one verification iteration
    assert int(sol.iter) <= 3


@pytest.mark.parametrize("fd", [True, False], ids=["fddp", "ddp"])
def test_random_lqr_matches_oracle(fd):
    nx, nu, horizon = 5, 2, 15
    m = random_lqr_model(jax.random.PRNGKey(0), nx, nu)
    prob = ShootingProblem(x0=jnp.full((nx,), 0.5),
                           running=replicate_model(m, horizon), terminal=m)
    settings = SolverSettings(maxiter=20, feasibility_driven=fd)
    sol = solve(prob, settings=settings)

    params = {k: np.asarray(getattr(m, k))
              for k in ["Fx", "Fu", "f0", "Lxx", "Lxu", "Luu", "lx", "lu"]}
    oracle = lqr_oracle(params, np.full((nx,), 0.5), horizon,
                        feasibility_driven=fd)
    ok = oracle.solve(maxiter=20)

    assert bool(sol.converged) == ok
    assert int(sol.iter) == oracle.iter
    np.testing.assert_allclose(np.asarray(sol.cost), oracle.cost, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.us), oracle.us, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.K), oracle.K, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.Vx), oracle.Vx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.Vxx), oracle.Vxx, atol=1e-6)


def test_batched_solve_vmap():
    """Data-parallel batched solves: vmap over initial states."""
    m = UnicycleModel()
    prob_of = lambda x0: ShootingProblem(
        x0=x0, running=replicate_model(m, T), terminal=m)
    x0s = jnp.asarray([[-1.0, -1.0, 1.0], [0.5, 0.8, -0.3], [2.0, 0.0, 0.1]])
    settings = SolverSettings(maxiter=30, record_trace=False)

    sols = jax.vmap(lambda x0: solve(prob_of(x0), settings=settings))(x0s)
    for i, x0 in enumerate(np.asarray(x0s)):
        oracle = unicycle_oracle(x0, T)
        ok = oracle.solve(maxiter=30)
        assert bool(sols.converged[i]) == ok
        assert int(sols.iter[i]) == oracle.iter
        np.testing.assert_allclose(np.asarray(sols.cost[i]), oracle.cost,
                                   rtol=1e-9)


def test_diff_lqr_derivatives_vs_numdiff():
    """Continuous-time LQR + Euler (diff-lqr.hxx:46-80 over euler.hxx):
    closed-form calc_diff matches the shared FD oracle."""
    from crocoddyl_tpu.models.lqr import diff_lqr_model
    from crocoddyl_tpu.utils.numdiff import numdiff_action

    m = diff_lqr_model(nq=3, nu=2, dt=0.1)
    x = jnp.asarray(np.linspace(-0.5, 0.8, 6))
    u = jnp.asarray([0.3, -0.2])
    d = m.calc_diff(x, u)
    nd = numdiff_action(m, x, u, h=1e-6)
    np.testing.assert_allclose(np.asarray(d.Fx), np.asarray(nd.Fx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.Fu), np.asarray(nd.Fu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.Lx), np.asarray(nd.Lx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.Lu), np.asarray(nd.Lu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.Lxx), np.asarray(nd.Lxx),
                               atol=1e-3)


def test_diff_lqr_euler_consistency():
    """dt→0 limit: the integrated step approaches x + dt·[v; a] (the
    semi-implicit term dt² vanishes), and the dt=0 node is terminal."""
    from crocoddyl_tpu.models.lqr import diff_lqr_model

    x = jnp.asarray(np.linspace(-0.5, 0.8, 6))
    u = jnp.asarray([0.3, -0.2])
    m1 = diff_lqr_model(nq=3, nu=2, dt=1e-6)
    xn, _ = m1.calc(x, u)
    a = np.asarray(m1._xout(x, u))
    expect = np.asarray(x) + 1e-6 * np.concatenate([np.asarray(x[3:]), a])
    np.testing.assert_allclose(np.asarray(xn), expect, atol=1e-10)
    m0 = diff_lqr_model(nq=3, nu=2, dt=0.0)
    xn0, c0 = m0.calc(x, u)
    np.testing.assert_allclose(np.asarray(xn0), np.asarray(x), atol=0)
    np.testing.assert_allclose(float(c0), float(m0._cost_rate(x, u)))


def test_diff_lqr_fddp_converges():
    """FDDP on the continuous LQR (one-iteration exactness on a quadratic
    problem with linear dynamics after feasibility)."""
    from crocoddyl_tpu.models.lqr import diff_lqr_model

    m = diff_lqr_model(nq=4, nu=4, dt=0.05)
    prob = ShootingProblem(x0=jnp.full((8,), 0.3),
                           running=replicate_model(m, 30),
                           terminal=m.replace(dt=jnp.zeros(())))
    sol = solve(prob, settings=SolverSettings(maxiter=20, record_trace=False))
    assert bool(sol.converged)
    assert np.all(np.isfinite(np.asarray(sol.us)))
