"""RH5 thesis layer: squat/balancing problem factories + CoP/ZMP analysis
(reference: RH5/utils/walkProblem.py:193-281, RH5/utils/utils.py:845-1229)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import BipedGaitFactory
from crocoddyl_tpu.apps.rh5 import calc_cops, calc_zmps, log_solution_csv
from crocoddyl_tpu.dynamics import robots


def _factory():
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = BipedGaitFactory(m, ["right_sole", "left_sole"],
                           default_q=np.asarray(q0))
    return fac, x0


def _solve(prob, maxiter=60):
    xs = jnp.tile(prob.x0[None], (prob.T + 1, 1))
    us = prob.quasi_static(xs)
    return ct.solve(prob, xs_init=xs, us_init=us,
                    settings=ct.SolverSettings(maxiter=maxiter))


def test_squat_problem_structure_and_solve():
    fac, x0 = _factory()
    prob = fac.squat_problem(x0, height_change=0.08, num_knots=10, dt=0.06,
                             recovery_knots=2)
    assert prob.T == 12
    sol = _solve(prob)
    assert not bool(sol.diverged)
    # CoM actually descends along the horizon.  The scaled-down recipe
    # (0.6 s vs the reference's 2.1 s squat) only tracks part of the 8 cm
    # target before the control-effort term pushes back — assert a clear
    # descent, not full tracking (the example runs reference sizes).
    from crocoddyl_tpu.dynamics import algorithms as algo
    m = prob.state.model
    nq = prob.state.nq
    com = np.asarray(jax.vmap(
        lambda x: algo.center_of_mass(m, x[:nq]))(sol.xs))
    assert com[:, 2].min() < com[0, 2] - 0.01


def test_balancing_problem_structure():
    fac, x0 = _factory()
    prob = fac.balancing_problem(x0, support_knots=2, shift_knots=3,
                                 balance_knots=4, dt=0.03)
    # support + shift + balance + switch + shift-back + stabilize
    assert prob.T == 2 + 3 + 4 + 1 + 3 + 2
    sol = _solve(prob, maxiter=40)
    assert not bool(sol.diverged)


def test_zmp_and_cop_analysis(tmp_path):
    fac, x0 = _factory()
    prob = fac.squat_problem(x0, height_change=0.05, num_knots=6, dt=0.03,
                             recovery_knots=2)
    sol = _solve(prob)
    zmps = calc_zmps(prob, sol)
    assert zmps.shape == (prob.T, 3)
    # standing two-foot support: ZMP stays within a foot-length of the CoM
    from crocoddyl_tpu.dynamics import algorithms as algo
    com0 = np.asarray(algo.center_of_mass(prob.state.model,
                                          jnp.asarray(x0)[:prob.state.nq]))
    assert np.all(np.abs(zmps[:, 0] - com0[0]) < 0.5)
    assert np.all(np.abs(zmps[:, 1] - com0[1]) < 0.5)

    cops = calc_cops(prob, sol)
    assert cops, "6D sole contacts must yield CoP records"
    for rec in cops[: prob.T]:
        # CoP expressed in the sole frame: inside a generous foot box
        assert abs(rec["cop"][0]) < 0.3 and abs(rec["cop"][1]) < 0.2

    path = log_solution_csv(prob, sol, str(tmp_path / "sol.csv"))
    head = open(path).readline()
    assert "zmp_x" in head and "cop0_x" in head
    assert sum(1 for _ in open(path)) == prob.T + 1
