"""Multibody node tests: numdiff oracles + physics sanity + end-to-end FDDP.

Mirrors the reference's test strategy: analytic (here AD) derivatives checked
against finite differences (unittest/test_actions.cpp:68 pattern), contact
physics checked against static equilibrium, and a full solve as integration
test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.core.action import replicate_model, stack_models
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import (
    ActivationQuad, ActivationWeightedQuad)
from crocoddyl_tpu.models.multibody.actuations import (
    FloatingBaseActuation, FullActuation)
from crocoddyl_tpu.models.multibody.contacts import Contact3D, ContactSet
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFramePlacement, CostFrameTranslation, CostState)
from crocoddyl_tpu.models.multibody.nodes import (
    CostStack, ImpulseNode, RigidBodyNode)
from crocoddyl_tpu.utils.numdiff import jit_calc, jit_calc_diff
from crocoddyl_tpu.utils.numdiff import numdiff_fxlx as numdiff_node

one = jnp.ones(())


def make_free_node(rmodel, dt=0.05, xref=None, w_x=1e-1, w_u=1e-3):
    st = StateMultibody(model=rmodel)
    act = FullActuation(nv=rmodel.nv)
    xref = st.zero() if xref is None else xref
    costs = CostStack(items=(
        CostState(activation=ActivationQuad(), weight=jnp.asarray(w_x),
                  active=one, xref=xref),
        CostControl(activation=ActivationQuad(), weight=jnp.asarray(w_u),
                    active=one, uref=jnp.zeros(act.nu)),
    ))
    return RigidBodyNode(state_=st, actuation=act, costs=costs,
                         dt=jnp.asarray(dt))


@pytest.mark.parametrize("robot", ["double_pendulum", "arm7"])
def test_free_node_derivatives_vs_numdiff(robot):
    rmodel = getattr(robots, robot)()
    node = make_free_node(rmodel)
    st = node.state
    key = jax.random.PRNGKey(0)
    x = st.rand(key)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (node.nu,))
    d = jit_calc_diff(node, x, u)
    Fx, Fu, Lx, Lu = numdiff_node(node, x, u)
    np.testing.assert_allclose(np.asarray(d.Fx), Fx, atol=5e-5)
    np.testing.assert_allclose(np.asarray(d.Fu), Fu, atol=5e-5)
    np.testing.assert_allclose(np.asarray(d.Lx), Lx, atol=5e-4)
    np.testing.assert_allclose(np.asarray(d.Lu), Lu, atol=5e-4)


def quadruped_contact_node(dt=0.01, active=(1.0, 1.0, 1.0, 1.0)):
    rmodel = robots.quadruped()
    st = StateMultibody(model=rmodel)
    act = FloatingBaseActuation(nv=rmodel.nv)
    q0 = robots.quadruped_standing_q(rmodel)
    x0 = jnp.concatenate([q0, jnp.zeros(rmodel.nv)])
    oMi, _ = algo.forward_kinematics(rmodel, q0)
    contacts = []
    for i, foot in enumerate(["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]):
        fid = rmodel.frame_id(foot)
        pref = algo.frame_placement(rmodel, oMi, fid).p
        contacts.append(Contact3D(fid=fid, pref=pref,
                                  gains=jnp.asarray([0.0, 50.0]),
                                  active=jnp.asarray(active[i])))
    costs = CostStack(items=(
        CostState(activation=ActivationWeightedQuad(
            weights=jnp.concatenate([jnp.ones(rmodel.nv) * 1.0,
                                     jnp.ones(rmodel.nv) * 10.0])),
            weight=jnp.asarray(1e-1), active=one, xref=x0),
        CostControl(activation=ActivationQuad(), weight=jnp.asarray(1e-4),
                    active=one, uref=jnp.zeros(act.nu)),
    ))
    node = RigidBodyNode(state_=st, actuation=act, costs=costs,
                         contacts=ContactSet(contacts=tuple(contacts)),
                         dt=jnp.asarray(dt))
    return node, x0


def test_contact_node_static_equilibrium():
    node, x0 = quadruped_contact_node()
    u_qs = node.quasi_static(x0)
    a, cache = node._dynamics(x0, u_qs)
    # quasi-static torques keep the robot still
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-6)
    # total vertical contact force equals the weight
    rmodel = node.state.model
    total_mass = float(jnp.sum(rmodel.mass))
    fz = 0.0
    for i, c in enumerate(node.contacts.contacts):
        f_local = cache.contact_force(i)
        R = cache.frame_placement(c.fid).R
        fz += float((R @ f_local)[2])
    np.testing.assert_allclose(fz, total_mass * 9.81, rtol=1e-6)


def test_contact_node_constraint_satisfied():
    node, x0 = quadruped_contact_node()
    u = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (node.nu,))
    x = node.state.integrate(x0, 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), (node.state.ndx,)))
    a, cache = node._dynamics(x, u)
    Jc, a0, mask = node.contacts.calc(cache)
    np.testing.assert_allclose(np.asarray(Jc @ a + a0), 0.0, atol=1e-7)


def test_contact_node_derivatives_vs_numdiff():
    node, x0 = quadruped_contact_node()
    u = node.quasi_static(x0)
    d = jit_calc_diff(node, x0, u)
    Fx, Fu, Lx, Lu = numdiff_node(node, x0, u)
    np.testing.assert_allclose(np.asarray(d.Fx), Fx, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d.Fu), Fu, atol=2e-4)


def test_inactive_contact_zero_force():
    node, x0 = quadruped_contact_node(active=(1.0, 1.0, 1.0, 0.0))
    u_qs = node.quasi_static(x0)
    _, cache = node._dynamics(x0, u_qs)
    np.testing.assert_allclose(np.asarray(cache.contact_force(3)), 0.0,
                               atol=1e-12)


def test_pseudo_impulse_dt0():
    node, x0 = quadruped_contact_node(dt=0.0)
    u = jnp.zeros(node.nu)
    xnext, cost = jit_calc(node, x0, u)
    np.testing.assert_allclose(np.asarray(xnext), np.asarray(x0), atol=0)
    assert np.isfinite(float(cost))


def test_impulse_node_kills_contact_velocity():
    rmodel = robots.quadruped()
    st = StateMultibody(model=rmodel)
    q0 = robots.quadruped_standing_q(rmodel)
    v0 = jnp.zeros(rmodel.nv).at[2].set(-1.0)  # falling at 1 m/s
    x = jnp.concatenate([q0, v0])
    imps = []
    for foot in ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]:
        fid = rmodel.frame_id(foot)
        imps.append(Contact3D(fid=fid, pref=jnp.zeros(3),
                              gains=jnp.zeros(2), active=one))
    node = ImpulseNode(state_=st, impulses=ContactSet(contacts=tuple(imps)),
                       costs=CostStack(items=()), nu_=12,
                       r_coeff=jnp.zeros(()))
    xnext, cost = jit_calc(node, x, jnp.zeros(12))
    q1, v1 = xnext[:rmodel.nq], xnext[rmodel.nq:]
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), atol=0)
    kin = algo.KinCache(rmodel, q1, v1)
    for foot in ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"]:
        fid = rmodel.frame_id(foot)
        J = kin.frame_jacobian_local(fid)[:3]
        np.testing.assert_allclose(np.asarray(J @ v1), 0.0, atol=1e-8)


def test_arm_reaching_fddp():
    """End-to-end: 7-DoF arm reaching with FDDP (Talos-arm analogue)."""
    rmodel = robots.arm7()
    st = StateMultibody(model=rmodel)
    act = FullActuation(nv=rmodel.nv)
    fid = rmodel.frame_id("gripper")
    target = jnp.asarray([0.2, 0.2, -0.4])
    q0 = jnp.full((rmodel.nq,), 0.3)
    x0 = jnp.concatenate([q0, jnp.zeros(rmodel.nv)])
    wsr = jnp.concatenate([jnp.full((rmodel.nv,), 1e-2),
                           jnp.full((rmodel.nv,), 1e-1)])

    def running(dt, wgoal):
        return RigidBodyNode(
            state_=st, actuation=act, dt=jnp.asarray(dt),
            costs=CostStack(items=(
                CostFrameTranslation(activation=ActivationQuad(),
                                     weight=jnp.asarray(wgoal), active=one,
                                     fid=fid, pref=target),
                CostState(activation=ActivationWeightedQuad(weights=wsr),
                          weight=jnp.asarray(1.0), active=one, xref=x0),
                CostControl(activation=ActivationQuad(),
                            weight=jnp.asarray(1e-3), active=one,
                            uref=jnp.zeros(act.nu)),
            )))

    T = 25
    prob = ShootingProblem(
        x0=x0,
        running=replicate_model(running(0.02, 1.0), T),
        terminal=running(0.0, 1000.0))
    sol = solve(prob, settings=SolverSettings(maxiter=100, record_trace=False))
    assert bool(sol.converged)
    xT = sol.xs[-1]
    kin = algo.KinCache(rmodel, xT[:rmodel.nq], xT[rmodel.nq:])
    err = np.linalg.norm(np.asarray(kin.frame_placement(fid).p - target))
    assert err < 1e-2, err
