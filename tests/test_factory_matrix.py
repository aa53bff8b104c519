"""Factory-crossed model-zoo derivative matrix.

Mirrors the reference's factory-enumerated test registration
(unittest/factory/action.hpp:20-31 + test_actions.cpp:109-123: every test
function auto-registered over an enumerated model zoo).  Here the cross
product {every cost type} x {every activation} and the structural variants
{armature, RK4, mixed contact activity} are FD-checked in grouped nodes:
one node per activation carries ALL compatible costs at once, so a wrong
Jacobian in ANY (cost, activation) pair breaks the grouped check while the
suite stays at a handful of compiles (each parametrized case would pay its
own multi-second FD compile on this 2-core host).

First-order only (Fx, Fu, Lx, Lu): the production Hessians are
Gauss-Newton by design (reference cost-base convention), so second-order
FD would disagree for non-quadratic residuals by construction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crocoddyl_tpu.core.action import stack_models
from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import (
    ActivationQuad, ActivationQuadraticBarrier, ActivationSmoothAbs,
    ActivationWeightedQuad, ActivationWeightedQuadraticBarrier)
from crocoddyl_tpu.models.multibody.actuations import FloatingBaseActuation
from crocoddyl_tpu.models.multibody.contacts import Contact3D, ContactSet
from crocoddyl_tpu.models.multibody.costs import (
    CostCentroidalMomentum, CostCoM, CostContactForce,
    CostContactFrictionCone, CostControl, CostFramePlacement,
    CostFrameRotation, CostFrameTranslation, CostFrameVelocity, CostState)
from crocoddyl_tpu.models.multibody.frames import friction_cone
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode
from crocoddyl_tpu.utils.numdiff import numdiff_fxlx

one = jnp.ones(())


def _act_for(kind, nr):
    if kind == "quad":
        return ActivationQuad()
    if kind == "wquad":
        return ActivationWeightedQuad(
            weights=jnp.linspace(0.5, 2.0, nr))
    if kind == "smoothabs":
        return ActivationSmoothAbs()
    if kind == "barrier":
        return ActivationQuadraticBarrier(
            lb=jnp.full((nr,), -0.05), ub=jnp.full((nr,), 0.07))
    if kind == "wbarrier":
        return ActivationWeightedQuadraticBarrier(
            lb=jnp.full((nr,), -0.06), ub=jnp.full((nr,), 0.04),
            weights=jnp.linspace(0.5, 2.0, nr))
    raise ValueError(kind)


def _all_costs(st, m, feet, act_kind):
    """Every cost type instantiated with the given activation family."""
    nv, nu = st.nv, st.nv - 6
    cone = friction_cone((0., 0., 1.), 0.7, nf=4, inner_appr=True)
    xref = jnp.concatenate([m.neutral(), jnp.zeros(nv)])
    mk = lambda nr: _act_for(act_kind, nr)
    items = [
        CostState(xref=xref, activation=mk(2 * nv), weight=one, active=one),
        CostControl(uref=jnp.zeros(nu), activation=mk(nu), weight=one,
                    active=one),
        CostCoM(cref=jnp.asarray([0.05, 0.0, 0.45]), activation=mk(3),
                weight=one, active=one),
        CostFramePlacement(fid=feet[0], ref_R=jnp.eye(3),
                           ref_p=jnp.asarray([0.3, 0.2, 0.0]),
                           activation=mk(6), weight=one, active=one),
        CostFrameTranslation(fid=feet[1], pref=jnp.asarray([0.3, -0.2, 0.1]),
                             activation=mk(3), weight=one, active=one),
        CostFrameRotation(fid=feet[2], ref_R=jnp.eye(3), activation=mk(3),
                          weight=one, active=one),
        CostFrameVelocity(fid=feet[3], vref=jnp.zeros(6), activation=mk(6),
                          weight=one, active=one),
        CostContactForce(contact_idx=0, fref=jnp.asarray([0., 0., 60.]),
                         activation=mk(3), weight=one, active=one),
        CostContactFrictionCone(contact_idx=1, cone=cone,
                                activation=mk(cone.A.shape[0]), weight=one,
                                active=one),
        CostCentroidalMomentum(href=jnp.zeros(6), activation=mk(6),
                               weight=one, active=one),
    ]
    return CostStack(items=tuple(items))


@pytest.fixture(scope="module")
def zoo():
    m = robots.quadruped(dtype=np.float64)
    st = StateMultibody(model=m)
    feet = [m.frame_id(n) for n in
            ("LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT")]
    q0 = robots.quadruped_standing_q(m)
    key = jax.random.PRNGKey(7)
    dq = 0.05 * jax.random.normal(key, (m.nv,))
    q = st.integrate(jnp.concatenate([q0, jnp.zeros(m.nv)]),
                     jnp.concatenate([dq, jnp.zeros(m.nv)]))[:m.nq]
    v = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (m.nv,))
    x = jnp.concatenate([q, v])
    u = 5.0 * jax.random.normal(jax.random.PRNGKey(9), (m.nv - 6,))
    contacts = ContactSet(contacts=tuple(
        Contact3D(fid=f, pref=jnp.zeros(3),
                  gains=jnp.asarray([0.0, 50.0]),
                  active=jnp.asarray(a))
        for f, a in zip(feet, (1.0, 1.0, 0.0, 1.0))))  # mixed activity
    return m, st, feet, contacts, x, u


def _check(node, x, u, rtol=2e-4, atol=5e-5):
    d = jax.jit(lambda mm, xx, uu: mm.calc_diff(xx, uu))(node, x, u)
    Fx, Fu, Lx, Lu = numdiff_fxlx(node, x, u)
    sc = max(1.0, np.max(np.abs(Lx)))
    np.testing.assert_allclose(np.asarray(d.Fx), Fx, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(d.Fu), Fu, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(d.Lx) / sc, Lx / sc,
                               rtol=rtol, atol=atol)
    scu = max(1.0, np.max(np.abs(Lu)))
    np.testing.assert_allclose(np.asarray(d.Lu) / scu, Lu / scu,
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("act_kind",
                         ["quad", "wquad", "smoothabs", "barrier",
                          "wbarrier"])
def test_cost_x_activation_matrix(zoo, act_kind):
    """{all cost types} x {activation family}: grouped FD cross-check."""
    m, st, feet, contacts, x, u = zoo
    node = RigidBodyNode(
        state_=st, actuation=FloatingBaseActuation(nv=m.nv),
        costs=_all_costs(st, m, feet, act_kind), contacts=contacts,
        dt=jnp.asarray(0.01))
    _check(node, x, u)


def test_armature_contact_node(zoo):
    """Armature variant (free-fwddyn armature path) under contacts."""
    m, st, feet, contacts, x, u = zoo
    node = RigidBodyNode(
        state_=st, actuation=FloatingBaseActuation(nv=m.nv),
        costs=_all_costs(st, m, feet, "quad"), contacts=contacts,
        armature=jnp.linspace(0.05, 0.3, m.nv), dt=jnp.asarray(0.01))
    _check(node, x, u)


def test_rk4_free_node(zoo):
    """RK4 integrator x full cost zoo (free dynamics; the RK4 path takes
    the generic fused-AD branch in _tangent_outputs)."""
    m, st, feet, _, x, u = zoo
    # RK4 without contacts: contact KKT under RK4 substeps is supported but
    # slow to FD on this host; the free path covers the integrator chain
    costs = CostStack(items=tuple(
        c for c in _all_costs(st, m, feet, "quad").items
        if not isinstance(c, (CostContactForce, CostContactFrictionCone))))
    node = RigidBodyNode(
        state_=st, actuation=FloatingBaseActuation(nv=m.nv),
        costs=costs, contacts=None, integrator="rk4", dt=jnp.asarray(0.01))
    _check(node, x, u)
