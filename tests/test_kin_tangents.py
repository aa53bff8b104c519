"""Exactness of the closed-form sweep linearization.

algorithms.kin_tangent_basis must reproduce jax.linearize of the
level-synchronous kinematic sweep (KinData -> KinArrays) for every tangent
basis direction, on both a free-flyer robot (ANYmal) and a fixed-base arm —
the same oracle strategy the reference applies to its analytic derivatives
(unittest/test_diff_actions.cpp:103 against NumDiff).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody


def _models():
    return {
        "anymal": robots.anymal(),
        "arm": robots.arm7(),
    }


@pytest.mark.parametrize("name", sorted(_models()))
def test_tangent_basis_matches_linearize(name):
    m = _models()[name]
    st = StateMultibody(model=m)
    key = jax.random.PRNGKey(3)
    x = st.rand(key)
    q, v = x[: st.nq], x[st.nq:]

    def kin_of(dx):
        xi = st.integrate(x, dx)
        return algo.KinData(m, xi[: st.nq], xi[st.nq:]).arrays()

    z = jnp.zeros((st.ndx,), x.dtype)
    _, lin = jax.linearize(kin_of, z)
    ref = jax.vmap(lin)(jnp.eye(st.ndx, dtype=x.dtype))

    kin0 = algo.KinData(m, q, v)
    got = algo.kin_tangent_basis(kin0)

    for fname, a, b in zip(ref._fields, got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-9, rtol=1e-9,
            err_msg=f"{name}: field {fname}")


def test_tangent_basis_feeds_node_derivatives():
    """End-to-end: RigidBodyNode.calc_diff (which now consumes
    kin_tangent_basis) still matches the generic fused-AD jacobian."""
    from crocoddyl_tpu.models.multibody.activations import ActivationQuad
    from crocoddyl_tpu.models.multibody.actuations import FloatingBaseActuation
    from crocoddyl_tpu.models.multibody.costs import CostControl, CostState
    from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode

    m = robots.anymal()
    st = StateMultibody(model=m)
    key = jax.random.PRNGKey(11)
    x = st.rand(key)
    nu = st.nv - 6
    u = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (nu,), x.dtype)
    costs = CostStack(items=(
        CostState(xref=st.zero(), activation=ActivationQuad(),
                  weight=jnp.asarray(1.0), active=jnp.asarray(1.0)),
        CostControl(uref=jnp.zeros(nu), activation=ActivationQuad(),
                    weight=jnp.asarray(0.1), active=jnp.asarray(1.0)),
    ))
    node = RigidBodyNode(state_=st, actuation=FloatingBaseActuation(nv=st.nv),
                         costs=costs, contacts=None, dt=jnp.asarray(5e-3))

    d = node.calc_diff(x, u)
    xnext0, _, _ = node._compute(x, u)

    def g(dx, du):
        xn, _, _ = node._compute(st.integrate(x, dx), u + du)
        return st.diff(xnext0, xn)

    Fx_ad, Fu_ad = jax.jacfwd(g, argnums=(0, 1))(
        jnp.zeros((st.ndx,), x.dtype), jnp.zeros((nu,), x.dtype))
    np.testing.assert_allclose(np.asarray(d.Fx), np.asarray(Fx_ad), atol=1e-8)
    np.testing.assert_allclose(np.asarray(d.Fu), np.asarray(Fu_ad), atol=1e-8)
