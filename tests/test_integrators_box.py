"""RK4 integrator + box-constrained solver tests.

Reference: core/integrator/rk4.hpp is an empty stub (the fork never
implemented RK4 in C++ — only a Python test oracle, unittest/python/
test_rk4.py); here RK4 is a first-class integrator option.  Box solvers:
box-ddp.cpp / box-fddp.cpp."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import crocoddyl_tpu as ct
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import ActivationQuad
from crocoddyl_tpu.models.multibody.actuations import FullActuation
from crocoddyl_tpu.models.multibody.costs import CostControl, CostState
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


def _pendulum_node(dt, integrator):
    m = robots.pendulum()
    st = StateMultibody(model=m)
    costs = CostStack(items=(
        CostState(xref=jnp.zeros(2), activation=ActivationQuad(),
                  weight=jnp.asarray(1.0), active=jnp.asarray(1.0)),
        CostControl(uref=jnp.zeros(1), activation=ActivationQuad(),
                    weight=jnp.asarray(1e-3), active=jnp.asarray(1.0)),
    ))
    return RigidBodyNode(state_=st, actuation=FullActuation(nv=1),
                         costs=costs, contacts=None,
                         dt=jnp.asarray(dt), integrator=integrator)


def _exact_pendulum_energy(x):
    # pendulum(): mass 1, com at -0.5 z, I_yy = 0.01 about com
    th, w = float(x[0]), float(x[1])
    I_pivot = 0.01 + 1.0 * 0.5 ** 2
    return 0.5 * I_pivot * w ** 2 - 1.0 * 9.81 * 0.5 * np.cos(th)


def test_rk4_more_accurate_than_euler():
    """Free swing (u=0): RK4 conserves energy far better at a coarse dt."""
    x0 = jnp.asarray([1.2, 0.0])
    u = jnp.zeros((1,))
    drifts = {}
    for integ in ("euler", "rk4"):
        node = _pendulum_node(0.05, integ)
        x = x0
        for _ in range(40):
            x, _ = node.calc(x, u)
        drifts[integ] = abs(_exact_pendulum_energy(x)
                            - _exact_pendulum_energy(x0))
    assert drifts["rk4"] < 0.05 * drifts["euler"]


def test_rk4_node_solves():
    node = _pendulum_node(0.02, "rk4")
    T = 20
    prob = ct.ShootingProblem(x0=jnp.asarray([2.5, 0.0]),
                              running=ct.replicate_model(node, T),
                              terminal=node.replace(dt=jnp.asarray(0.0)))
    sol = ct.solve(prob, settings=ct.SolverSettings(maxiter=60,
                                                    record_trace=False))
    assert np.isfinite(float(sol.cost))
    assert float(sol.cost) < float(jnp.sum(prob.calc(
        jnp.tile(prob.x0[None], (T + 1, 1)), jnp.zeros((T, 1)))[1]))


def test_box_fddp_respects_bounds_multibody():
    """BoxFDDP on the pendulum with tight torque bounds: |u| <= lim."""
    node = _pendulum_node(0.02, "euler")
    T = 30
    prob = ct.ShootingProblem(x0=jnp.asarray([2.0, 0.0]),
                              running=ct.replicate_model(node, T),
                              terminal=node.replace(dt=jnp.asarray(0.0)))
    lim = 4.0
    sol = ct.solve(prob, settings=ct.box_fddp_settings(maxiter=60,
                                                       record_trace=False),
                   u_lb=jnp.asarray([-lim]), u_ub=jnp.asarray([lim]))
    assert float(jnp.max(jnp.abs(sol.us))) <= lim + 1e-6
    assert np.isfinite(float(sol.cost))
