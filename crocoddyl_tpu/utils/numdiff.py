"""Finite-difference derivative checkers.

Reference: core/numdiff/{action,diff-action,activation,state,actuation}.hpp —
the reference wraps any model and fills its Data with finite-difference
derivatives, used pervasively by the unit tests
(test_partial_derivatives_against_numdiff, unittest/test_actions.cpp:68).

Here the same role: given any ActionModel, compute FD derivatives in tangent
coordinates (column-wise ``integrate(x, h·e_i)`` exactly like
core/numdiff/action.hxx:60-97) and return a NodeDerivs for comparison against
``calc_diff``.  The default disturbance is √(2ε) (action.hxx:18).
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from ..core.action import ActionModel, NodeDerivs

DISTURBANCE = math.sqrt(2.0 * np.finfo(float).eps)


def numdiff_action(model: ActionModel, x, u, h: float = None) -> NodeDerivs:
    """FD Fx/Fu/Lx/Lu + Gauss-Newton-free FD Hessians (central differences on
    the gradient for L**)."""
    st = model.state
    h = DISTURBANCE if h is None else h
    ndx, nu = st.ndx, model.nu
    x = jnp.asarray(x)
    u = jnp.asarray(u)
    xn0, c0 = model.calc(x, u)

    def ei(n, i):
        return jnp.zeros((n,)).at[i].set(1.0)

    Fx = np.zeros((ndx, ndx))
    Lx = np.zeros(ndx)
    for i in range(ndx):
        xp = st.integrate(x, h * ei(ndx, i))
        xni, ci = model.calc(xp, u)
        Fx[:, i] = np.asarray(st.diff(xn0, xni)) / h
        Lx[i] = (float(ci) - float(c0)) / h
    Fu = np.zeros((ndx, nu))
    Lu = np.zeros(nu)
    for i in range(nu):
        up = u + h * ei(nu, i)
        xni, ci = model.calc(x, up)
        Fu[:, i] = np.asarray(st.diff(xn0, xni)) / h
        Lu[i] = (float(ci) - float(c0)) / h

    # second-order FD on the analytic-free gradient (cost only)
    def grad(xq, uq):
        gx = np.zeros(ndx)
        gu = np.zeros(nu)
        _, c = model.calc(xq, uq)
        for i in range(ndx):
            _, ci = model.calc(st.integrate(xq, h * ei(ndx, i)), uq)
            gx[i] = (float(ci) - float(c)) / h
        for i in range(nu):
            _, ci = model.calc(xq, uq + h * ei(nu, i))
            gu[i] = (float(ci) - float(c)) / h
        return gx, gu

    gx0, gu0 = grad(x, u)
    Lxx = np.zeros((ndx, ndx))
    Lxu = np.zeros((ndx, nu))
    Luu = np.zeros((nu, nu))
    for i in range(ndx):
        gxi, gui = grad(st.integrate(x, h * ei(ndx, i)), u)
        Lxx[:, i] = (gxi - gx0) / h
        Lxu[i, :] = (gui - gu0) / h
    for i in range(nu):
        gxi, gui = grad(x, u + h * ei(nu, i))
        Luu[:, i] = (gui - gu0) / h

    return NodeDerivs(Fx=jnp.asarray(Fx), Fu=jnp.asarray(Fu),
                      Lx=jnp.asarray(Lx), Lu=jnp.asarray(Lu),
                      Lxx=jnp.asarray(Lxx), Lxu=jnp.asarray(Lxu),
                      Luu=jnp.asarray(Luu))


def numdiff_state(state, x0, x1, h: float = None):
    """FD Jdiff/Jintegrate (core/numdiff/state.hpp semantics): returns
    (Jdiff_first, Jdiff_second, Jint_x, Jint_dx) evaluated at (x0, x1) and
    (x0, dx=diff(x0,x1))."""
    h = DISTURBANCE if h is None else h
    ndx = state.ndx
    d0 = state.diff(x0, x1)

    def ei(i):
        return jnp.zeros((ndx,)).at[i].set(1.0)

    J1 = np.zeros((ndx, ndx))
    J2 = np.zeros((ndx, ndx))
    for i in range(ndx):
        J1[:, i] = np.asarray(
            state.diff(state.integrate(x0, h * ei(i)), x1) - d0) / h
        J2[:, i] = np.asarray(
            state.diff(x0, state.integrate(x1, h * ei(i))) - d0) / h
    dx = d0
    y0 = state.integrate(x0, dx)
    Jx = np.zeros((ndx, ndx))
    Jdx = np.zeros((ndx, ndx))
    for i in range(ndx):
        Jx[:, i] = np.asarray(state.diff(
            y0, state.integrate(state.integrate(x0, h * ei(i)), dx))) / h
        Jdx[:, i] = np.asarray(state.diff(
            y0, state.integrate(x0, dx + h * ei(i)))) / h
    return (jnp.asarray(J1), jnp.asarray(J2), jnp.asarray(Jx),
            jnp.asarray(Jdx))


def numdiff_fxlx(model: ActionModel, x, u, h: float = 1e-6):
    """First-order FD (Fx, Fu, Lx, Lu) only — the cheap per-test oracle
    (core/numdiff/action.hxx:60-97 column construction).  Returns numpy."""
    st = model.state
    xn0, c0 = model.calc(x, u)
    ndx, nu = st.ndx, model.nu
    Fx = np.zeros((ndx, ndx))
    Fu = np.zeros((ndx, nu))
    Lx = np.zeros(ndx)
    Lu = np.zeros(nu)
    for i in range(ndx):
        dx = jnp.zeros(ndx).at[i].set(h)
        xn, c = model.calc(st.integrate(x, dx), u)
        Fx[:, i] = np.asarray(st.diff(xn0, xn)) / h
        Lx[i] = (float(c) - float(c0)) / h
    for i in range(nu):
        du = jnp.zeros(nu).at[i].set(h)
        xn, c = model.calc(x, u + du)
        Fu[:, i] = np.asarray(st.diff(xn0, xn)) / h
        Lu[i] = (float(c) - float(c0)) / h
    return Fx, Fu, Lx, Lu


def numdiff_actuation(actuation, x, u, h: float = None):
    """FD (dtau_dx, dtau_du) for an actuation model
    (core/numdiff/actuation.hpp semantics); dtau_dx in tangent coordinates
    requires the caller's state for the retraction."""
    h = DISTURBANCE if h is None else h
    tau0 = actuation.calc(x, u)
    nu = u.shape[0]
    dtau_du = np.zeros((tau0.shape[0], nu))
    for i in range(nu):
        taui = actuation.calc(x, u + h * jnp.zeros(nu).at[i].set(1.0))
        dtau_du[:, i] = np.asarray(taui - tau0) / h
    return jnp.asarray(dtau_du)


def numdiff_activation(activation, r, h: float = None):
    """FD (Ar, Arr) for an activation (core/numdiff/activation.hpp)."""
    h = DISTURBANCE if h is None else h
    r = jnp.asarray(r)
    n = r.shape[0]
    a0, _, _ = activation.calc(r)
    Ar = np.zeros(n)
    for i in range(n):
        ai, _, _ = activation.calc(r.at[i].add(h))
        Ar[i] = (float(ai) - float(a0)) / h
    Arr = np.zeros(n)
    for i in range(n):
        _, Ari_p, _ = activation.calc(r.at[i].add(h))
        _, Ari_0, _ = activation.calc(r)
        Arr[i] = float(Ari_p[i] - Ari_0[i]) / h
    return jnp.asarray(Ar), jnp.asarray(Arr)
