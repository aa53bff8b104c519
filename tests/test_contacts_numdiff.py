"""Contact-model FD validation (reference: multibody/numdiff/contact.hpp +
unittest/test_contacts.cpp:141 test_partial_derivatives_against_numdiff).

The production node-derivative path gets contact tangents from the
CLOSED-FORM per-frame path (algorithms.frame_tangents contracted through
Contact{3D,6D}.calc_tangent — nodes.py:_tangent_outputs); the generic
sweep-linearization basis (kin_tangent_basis) is only the fallback for
costs without a residual_jac_x closed form.  This suite pins the analytic
path per contact model against utils.numdiff.numdiff_contact finite
differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.contacts import Contact3D, Contact6D
from crocoddyl_tpu.models.multibody.nodes import NodeCache
from crocoddyl_tpu.utils.numdiff import numdiff_contact

TOL = 5e-5  # sqrt-disturbance-scale FD tolerance (test_contacts.cpp:141)


def _setup():
    m = robots.quadruped()
    st = StateMultibody(m)
    key = jax.random.PRNGKey(3)
    q = m.random_q(key)
    v = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (m.nv,))
    x = jnp.concatenate([q, v])
    a = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (m.nv,))
    return m, st, x, a


def _analytic(contact, st, x, a):
    """The production path: sweep linearized once, contact tangents by
    contraction (nodes.py:_tangent_outputs stage A)."""
    m = st.model
    nq = st.nq
    kin0 = algo.KinData(m, x[:nq], x[nq:])
    ka0 = kin0.arrays()
    dka = algo.kin_tangent_basis(kin0)
    z = jnp.zeros((st.ndx,), x.dtype)
    dxi = jnp.transpose(jax.jacfwd(lambda dx: st.integrate(x, dx))(z))

    def h(ka, xi):
        kin = algo.KinData.from_arrays(m, xi[:nq], xi[nq:], ka)
        J, a0 = contact.calc(NodeCache(kin))
        return a0, J @ a

    (_, _), lin = jax.linearize(h, ka0, dxi[0] * 0 + x)
    da0, dJa = jax.vmap(lin)(dka, dxi)
    return da0.T, dJa.T


@pytest.mark.parametrize("make", [
    lambda m: Contact3D(fid=m.frame_id("LF_FOOT"),
                        pref=jnp.asarray([0.3, 0.2, 0.0]),
                        gains=jnp.asarray([10.0, 4.0]),
                        active=jnp.ones(())),
    lambda m: Contact6D(fid=m.frame_id("RH_FOOT"),
                        ref_R=jnp.eye(3), ref_p=jnp.asarray([-0.3, -0.2, 0.0]),
                        gains=jnp.asarray([8.0, 2.0]),
                        active=jnp.ones(())),
], ids=["contact3d", "contact6d"])
def test_contact_derivatives_against_numdiff(make):
    m, st, x, a = _setup()
    contact = make(m)
    J0, a00, da0_fd, dJa_fd = numdiff_contact(contact, st, x, a, h=1e-7)
    da0_an, dJa_an = _analytic(contact, st, x, a)
    np.testing.assert_allclose(np.asarray(da0_an), np.asarray(da0_fd),
                               atol=TOL * (1 + np.abs(da0_fd).max()))
    np.testing.assert_allclose(np.asarray(dJa_an), np.asarray(dJa_fd),
                               atol=TOL * (1 + np.abs(dJa_fd).max()))


def test_contact3d_baumgarte_gains_enter_a0():
    m, st, x, _ = _setup()
    kin = algo.KinData(st.model, x[:st.nq], x[st.nq:])
    cache = NodeCache(kin)
    c0 = Contact3D(fid=m.frame_id("LF_FOOT"), pref=jnp.zeros(3),
                   gains=jnp.asarray([0.0, 0.0]), active=jnp.ones(()))
    c1 = c0.replace(gains=jnp.asarray([50.0, 0.0]))
    _, a0_0 = c0.calc(cache)
    _, a0_1 = c1.calc(cache)
    p = kin.frame_placement(m.frame_id("LF_FOOT")).p
    np.testing.assert_allclose(np.asarray(a0_1 - a0_0), 50.0 * np.asarray(p),
                               rtol=1e-10)


@pytest.mark.parametrize("make", [
    lambda m: Contact3D(fid=m.frame_id("LF_FOOT"),
                        pref=jnp.asarray([0.3, 0.2, 0.0]),
                        gains=jnp.asarray([10.0, 4.0]),
                        active=jnp.ones(())),
    lambda m: Contact6D(fid=m.frame_id("RH_FOOT"),
                        ref_R=jnp.asarray(np.linalg.qr(
                            np.random.RandomState(0).randn(3, 3))[0]
                            * np.sign(np.linalg.det(np.linalg.qr(
                                np.random.RandomState(0).randn(3, 3))[0]))),
                        ref_p=jnp.asarray([-0.3, -0.2, 0.0]),
                        gains=jnp.asarray([8.0, 2.0]),
                        active=jnp.ones(())),
], ids=["contact3d", "contact6d"])
def test_closed_form_contact_tangent_vs_linearize(make):
    """ContactSet.calc_tangents (closed form via algorithms.frame_tangents)
    vs jax.linearize of r2 = −(Jc·a + a0) through the sweep."""
    m, st, x, a = _setup()
    contact = make(m)
    nq = st.nq

    kin0 = algo.KinData(m, x[:nq], x[nq:])
    ka0 = kin0.arrays()
    dka = algo.kin_tangent_basis(kin0)
    z = jnp.zeros((st.ndx,), x.dtype)
    dxi = jnp.transpose(jax.jacfwd(lambda dx: st.integrate(x, dx))(z))

    def h(ka, xi):
        kin = algo.KinData.from_arrays(m, xi[:nq], xi[nq:], ka)
        J, a0 = contact.calc(NodeCache(kin))
        return -(J @ a + a0)

    _, lin = jax.linearize(h, ka0, x)
    dr2_ad = jax.vmap(lin)(dka, dxi)            # (ndx, nc)

    cache = NodeCache(kin0)
    ft = algo.frame_tangents(kin0, a, contact.fid)
    dr2_cf = contact.calc_tangent(cache, ft)    # (ndx, nc)
    np.testing.assert_allclose(np.asarray(dr2_cf), np.asarray(dr2_ad),
                               atol=1e-9 * (1 + np.abs(dr2_ad).max()))
