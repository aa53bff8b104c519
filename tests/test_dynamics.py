"""Rigid-body dynamics correctness tests.

Mirrors the reference's numerical-derivative-oracle strategy (SURVEY §4):
every algorithm is cross-checked against an independent construction —
RNEA↔ABA inversion, CRBA vs RNEA columns, analytic pendulum physics,
AD-based Jacobians, manifold round-trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import lie, robots
from crocoddyl_tpu.dynamics.states import StateMultibody

MODELS = {
    "pendulum": robots.pendulum,
    "double_pendulum": robots.double_pendulum,
    "cartpole": robots.cartpole,
    "arm7": robots.arm7,
    "quadruped": robots.quadruped,
}


@pytest.fixture(params=list(MODELS), scope="module")
def model(request):
    return MODELS[request.param]()


def _rand_qva(model, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kv, ka = jax.random.split(key, 3)
    q = model.random_q(kq)
    v = jax.random.uniform(kv, (model.nv,), minval=-1.0, maxval=1.0)
    a = jax.random.uniform(ka, (model.nv,), minval=-1.0, maxval=1.0)
    return q, v, a


def test_rnea_aba_roundtrip(model):
    q, v, a = _rand_qva(model)
    tau = algo.rnea(model, q, v, a)
    a2 = algo.aba(model, q, v, tau)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), atol=1e-8)


def test_crba_vs_rnea(model):
    """M(q) columns == rnea(q, 0, e_i) - gravity; M symmetric PD."""
    q, v, _ = _rand_qva(model, 1)
    M = algo.crba(model, q)
    z = jnp.zeros((model.nv,))
    g = algo.rnea(model, q, z, z)
    cols = []
    for i in range(model.nv):
        e = jnp.zeros((model.nv,)).at[i].set(1.0)
        cols.append(algo.rnea(model, q, z, e) - g)
    M_ref = jnp.stack(cols, axis=1)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-10)
    assert np.linalg.eigvalsh(np.asarray(M)).min() > 0


def test_aba_solves_newton_euler(model):
    """ABA(q,v,tau) == M⁻¹(tau − b)."""
    q, v, _ = _rand_qva(model, 2)
    tau = jax.random.normal(jax.random.PRNGKey(5), (model.nv,))
    M = algo.crba(model, q)
    b = algo.nonlinear_effects(model, q, v)
    a_ref = jnp.linalg.solve(M, tau - b)
    a = algo.aba(model, q, v, tau)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), atol=1e-8)


def test_pendulum_statics():
    """Gravity torque of a pendulum: tau = -m g Lc sin(theta) about +y axis."""
    m = robots.pendulum()
    for th in [0.0, 0.3, 1.2, -0.7]:
        q = jnp.asarray([th])
        tau = algo.gravity_torque(m, q)
        # com 0.5 below joint; axis +y; gravity -z; holding torque +mgL·sinθ
        expected = 1.0 * 9.81 * 0.5 * np.sin(th)
        np.testing.assert_allclose(float(tau[0]), expected, atol=1e-10)


def test_free_fall():
    """A floating body with zero torque accelerates at g (body frame)."""
    m = robots.quadruped()
    q = robots.quadruped_standing_q(m)
    v = jnp.zeros((m.nv,))
    tau = jnp.zeros((m.nv,))
    a = algo.aba(m, q, v, tau)
    # base linear acceleration = gravity (identity base orientation)
    np.testing.assert_allclose(np.asarray(a[:3]), [0.0, 0.0, -9.81], atol=1e-6)


def test_frame_jacobian_vs_ad():
    m = robots.arm7()
    q, v, _ = _rand_qva(m, 3)
    fid = m.frame_id("gripper")

    J = algo.frame_jacobian(m, q, fid, "local")
    # AD check: finite tangent motion of the frame placement
    st = StateMultibody(model=m)

    def placement_log(dq):
        qn = st._q_integrate(q, dq)
        oMi, _ = algo.forward_kinematics(m, qn)
        oMf = algo.frame_placement(m, oMi, fid)
        oMi0, _ = algo.forward_kinematics(m, q)
        oMf0 = algo.frame_placement(m, oMi0, fid)
        rel = oMf0.inverse().compose(oMf)
        return lie.log6(rel.R, rel.p)

    J_ad = jax.jacfwd(placement_log)(jnp.zeros((m.nv,)))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-7)


def test_frame_velocity_consistent_with_jacobian():
    m = robots.quadruped()
    q, v, _ = _rand_qva(m, 4)
    fid = m.frame_id("LF_FOOT")
    J = algo.frame_jacobian(m, q, fid, "local")
    oMi, vels = algo.forward_kinematics(m, q, v)
    vf = algo.frame_velocity(m, vels, fid)
    np.testing.assert_allclose(np.asarray(J @ v), np.asarray(vf), atol=1e-8)


def test_com_weighted_average():
    m = robots.double_pendulum()
    q = jnp.asarray([0.3, -0.5])
    com = algo.center_of_mass(m, q)
    # independent: average of body com positions via FK
    oMi, _ = algo.forward_kinematics(m, q)
    # oMi is a stacked Transform: leaves have a leading (njoints,) axis
    p1 = oMi.act_point(m.com)[0]
    p2 = oMi.act_point(m.com)[1]
    ref = (m.mass[0] * p1 + m.mass[1] * p2) / (m.mass[0] + m.mass[1])
    np.testing.assert_allclose(np.asarray(com), np.asarray(ref), atol=1e-12)


# ---------------------------------------------------------------------------
# State manifold
# ---------------------------------------------------------------------------

def test_state_integrate_diff_roundtrip():
    m = robots.quadruped()
    st = StateMultibody(model=m)
    key = jax.random.PRNGKey(7)
    x0 = st.rand(key)
    dx = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (st.ndx,))
    x1 = st.integrate(x0, dx)
    dx_rec = st.diff(x0, x1)
    np.testing.assert_allclose(np.asarray(dx_rec), np.asarray(dx), atol=1e-9)


def test_state_diff_integrate_roundtrip():
    m = robots.quadruped()
    st = StateMultibody(model=m)
    x0 = st.rand(jax.random.PRNGKey(9))
    x1 = st.rand(jax.random.PRNGKey(10))
    dx = st.diff(x0, x1)
    x1_rec = st.integrate(x0, dx)
    # quaternion sign may flip; compare rotations via diff ≈ 0
    np.testing.assert_allclose(np.asarray(st.diff(x1_rec, x1)),
                               np.zeros(st.ndx), atol=1e-9)


def test_state_jacobians_consistent():
    """jdiff/jintegrate (AD defaults) satisfy the chain-rule identities."""
    m = robots.double_pendulum()
    st = StateMultibody(model=m)
    x0 = st.rand(jax.random.PRNGKey(11))
    dx = 0.2 * jax.random.normal(jax.random.PRNGKey(12), (st.ndx,))
    x1 = st.integrate(x0, dx)
    J0, J1 = st.jdiff(x0, x1)
    Jx, Jdx = st.jintegrate(x0, dx)
    # d diff(x0, integrate(x0,dx)) / d dx = J1 @ Jdx == I at consistency
    np.testing.assert_allclose(np.asarray(J1 @ Jdx), np.eye(st.ndx),
                               atol=1e-7)


def test_lie_exp_log_roundtrip():
    key = jax.random.PRNGKey(13)
    for i in range(5):
        w = jax.random.normal(jax.random.fold_in(key, i), (3,))
        if i == 0:
            w = w * 1e-10  # small-angle branch
        R = lie.exp3(w)
        np.testing.assert_allclose(np.asarray(lie.log3(R)), np.asarray(w),
                                   atol=1e-8)
        xi = jax.random.normal(jax.random.fold_in(key, 100 + i), (6,))
        R6, p6 = lie.exp6(xi)
        np.testing.assert_allclose(np.asarray(lie.log6(R6, p6)),
                                   np.asarray(xi), atol=1e-8)


def test_batched_aba_vmap():
    m = robots.arm7()
    keys = jax.random.split(jax.random.PRNGKey(14), 4)
    qs = jax.vmap(m.random_q)(keys)
    vs = jax.random.normal(jax.random.PRNGKey(15), (4, m.nv))
    taus = jax.random.normal(jax.random.PRNGKey(16), (4, m.nv))
    a_b = jax.vmap(lambda q, v, t: algo.aba(m, q, v, t))(qs, vs, taus)
    for i in range(4):
        a_i = algo.aba(m, qs[i], vs[i], taus[i])
        np.testing.assert_allclose(np.asarray(a_b[i]), np.asarray(a_i),
                                   atol=1e-10)
