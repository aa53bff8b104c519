"""KKT-oracle cross-validation + box-constrained solver tests.

Reference patterns: unittest/test_solvers.cpp:65 (DDP vs KKT ground truth)
and examples/boxfddp_vs_boxddp.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crocoddyl_tpu.core.action import replicate_model
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers import kkt
from crocoddyl_tpu.core.solvers.fddp import (
    SolverSettings, box_ddp_settings, box_fddp_settings, solve)
from crocoddyl_tpu.models.lqr import random_lqr_model
from crocoddyl_tpu.models.unicycle import UnicycleModel


def lqr_problem(T=10, nx=4, nu=2, seed=0):
    m = random_lqr_model(jax.random.PRNGKey(seed), nx, nu)
    return ShootingProblem(x0=jnp.full((nx,), 0.3),
                           running=replicate_model(m, T), terminal=m)


def unicycle_problem(T=20):
    m = UnicycleModel()
    return ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=replicate_model(m, T), terminal=m)


def test_ddp_against_kkt_lqr():
    prob = lqr_problem()
    sol_kkt = kkt.solve(prob, maxiter=20)
    sol_ddp = solve(prob, settings=SolverSettings(
        maxiter=20, feasibility_driven=False, record_trace=False))
    assert bool(sol_kkt.converged)
    assert bool(sol_ddp.converged)
    np.testing.assert_allclose(np.asarray(sol_ddp.us), np.asarray(sol_kkt.us),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_ddp.xs), np.asarray(sol_kkt.xs),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_ddp.cost),
                               np.asarray(sol_kkt.cost), rtol=1e-9)


def test_fddp_against_kkt_unicycle():
    prob = unicycle_problem()
    sol_kkt = kkt.solve(prob, maxiter=60)
    sol = solve(prob, settings=SolverSettings(maxiter=60, record_trace=False))
    assert bool(sol_kkt.converged) and bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.us), np.asarray(sol_kkt.us),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.cost), np.asarray(sol_kkt.cost),
                               rtol=1e-8)


def test_boxddp_infinite_bounds_equals_ddp():
    prob = unicycle_problem()
    plain = solve(prob, settings=SolverSettings(
        maxiter=30, feasibility_driven=False, record_trace=False))
    boxed = solve(prob, settings=box_ddp_settings(maxiter=30, th_stop=1e-9,
                                                  record_trace=False),
                  u_lb=jnp.full((2,), -jnp.inf), u_ub=jnp.full((2,), jnp.inf))
    np.testing.assert_allclose(np.asarray(boxed.us), np.asarray(plain.us),
                               atol=1e-9)
    assert int(boxed.iter) == int(plain.iter)


def test_boxfddp_respects_bounds():
    prob = unicycle_problem()
    ub = jnp.asarray([1.0, 1.0])
    sol = solve(prob, settings=box_fddp_settings(maxiter=100,
                                                 record_trace=False),
                u_lb=-ub, u_ub=ub)
    us = np.asarray(sol.us)
    assert (us <= 1.0 + 1e-9).all() and (us >= -1.0 - 1e-9).all()
    assert bool(sol.converged)
    # bounds active: solution must differ from the unconstrained one
    free = solve(prob, settings=SolverSettings(maxiter=100,
                                               record_trace=False))
    assert np.abs(np.asarray(free.us)).max() > 1.0
    assert float(sol.cost) >= float(free.cost) - 1e-9


def test_boxddp_converges_with_bounds():
    prob = unicycle_problem()
    ub = jnp.asarray([1.0, 1.0])
    sol = solve(prob, settings=box_ddp_settings(maxiter=100,
                                                record_trace=False),
                u_lb=-ub, u_ub=ub)
    us = np.asarray(sol.us)
    assert (np.abs(us) <= 1.0 + 1e-9).all()
    assert bool(sol.converged)
