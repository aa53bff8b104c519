"""Whole-scan Pallas kernels (ops/fused_scans.py) vs the XLA solver stages.

The kernels replay hoisted jaxprs of the same per-step math as
fddp._backward_pass / _forward_pass, so interpret-mode equality against
the XLA implementations pins both the step math and the in-kernel loop /
dynamic-indexing plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.action import NodeDerivs
from crocoddyl_tpu.core.solvers import fddp
from crocoddyl_tpu.ops import fused_scans as fsc


def _rand_derivs(T, ndx, nu, key):
    ks = jax.random.split(key, 8)
    eye = jnp.eye(ndx)

    def rnd(k, *s):
        return 0.1 * jax.random.normal(k, s)

    derivs = NodeDerivs(
        Fx=jnp.tile(eye[None], (T, 1, 1)) + 0.01 * rnd(ks[0], T, ndx, ndx),
        Fu=rnd(ks[1], T, ndx, nu), Lx=rnd(ks[2], T, ndx),
        Lu=rnd(ks[3], T, nu), Lxx=jnp.tile(eye[None], (T, 1, 1)),
        Lxu=0.01 * rnd(ks[4], T, ndx, nu),
        Luu=jnp.tile(jnp.eye(nu)[None], (T, 1, 1)))
    dterm = NodeDerivs(
        Fx=eye, Fu=jnp.zeros((ndx, nu)), Lx=rnd(ks[5], ndx),
        Lu=jnp.zeros((nu,)), Lxx=eye, Lxu=jnp.zeros((ndx, nu)),
        Luu=jnp.zeros((nu, nu)))
    fs = rnd(ks[6], T + 1, ndx)
    return derivs, dterm, fs


def test_riccati_kernel_matches_backward_pass():
    derivs, dterm, fs = _rand_derivs(15, 36, 12, jax.random.PRNGKey(0))
    reg = jnp.asarray(1e-9)
    out = jax.jit(lambda d, dtm, f: fsc.riccati_backward_fused(
        d, dtm, f, reg, reg, interpret=True))(derivs, dterm, fs)
    ref = jax.jit(lambda d, dtm, f: fddp._backward_pass(
        d, dtm, f, reg, reg))(derivs, dterm, fs)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-9, atol=1e-10)


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
    return fac.walking_problem(x0, 0.25, 0.15, 1e-2,
                               step_knots=3, support_knots=1)


def test_rollout_kernel_matches_forward_pass(walk_small):
    prob = walk_small
    T = prob.T
    seg = prob.segments[0]
    st = prob.state
    xs = jnp.tile(prob.x0[None], (T + 1, 1))
    us = jax.jit(prob.quasi_static)(xs)
    key = jax.random.PRNGKey(3)
    k = 0.1 * jax.random.normal(key, (T, prob.nu))
    K = 0.01 * jax.random.normal(jax.random.PRNGKey(4),
                                 (T, prob.nu, st.ndx))
    fs = 0.01 * jax.random.normal(jax.random.PRNGKey(5), (T + 1, st.ndx))
    alpha = jnp.asarray(0.5)

    xs_r, us_r, x_last, cost_r, failed = jax.jit(
        lambda: fsc.trial_rollout_fused(seg, prob.x0, xs, us, k, K, fs,
                                        alpha, interpret=True))()
    xT = st.integrate(x_last, (alpha - 1.0) * fs[-1])
    cost = cost_r + prob.terminal.calc_terminal(xT)
    xs_full = jnp.concatenate([xs_r, xT[None]], axis=0)

    xs_ref, us_ref, cost_ref, failed_ref = jax.jit(
        lambda: fddp._forward_pass(prob, xs, us, k, K, fs, alpha))()
    np.testing.assert_allclose(np.asarray(xs_full), np.asarray(xs_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(us_r), np.asarray(us_ref),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-10)
    assert bool(failed) == bool(failed_ref)


def test_solve_with_fused_scans_matches(walk_small):
    prob = walk_small
    xs0 = jnp.tile(prob.x0[None], (prob.T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    base = ct.solve(prob, xs_init=xs0, us_init=us0,
                    settings=ct.SolverSettings(maxiter=25))
    fused = ct.solve(prob, xs_init=xs0, us_init=us0,
                     settings=ct.SolverSettings(maxiter=25,
                                                fused_scans=True))
    assert int(base.iter) == int(fused.iter)
    assert abs(float(base.cost) - float(fused.cost)) < 1e-6 * (
        1.0 + abs(float(base.cost)))
    assert float(jnp.max(jnp.abs(base.us - fused.us))) < 1e-8 * (
        1.0 + float(jnp.max(jnp.abs(base.us))))
