"""Finite-difference derivative checkers.

Reference: core/numdiff/{action,diff-action,activation,state,actuation}.hpp —
the reference wraps any model and fills its Data with finite-difference
derivatives, used pervasively by the unit tests
(test_partial_derivatives_against_numdiff, unittest/test_actions.cpp:68).

Here the same role: given any ActionModel, compute FD derivatives in tangent
coordinates (column-wise ``integrate(x, h·e_i)`` exactly like
core/numdiff/action.hxx:60-97) and return a NodeDerivs for comparison against
``calc_diff``.  The default disturbance is √(2ε) (action.hxx:18).

All column loops are vmapped inside module-level ``jax.jit`` wrappers: the
model is a pytree argument, so the compiled FD program is cached across calls
and tests — eager per-column dispatch of the full dynamics graph (thousands
of ops per eval with the unrolled linear-algebra kernels) is avoided.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..core.action import ActionModel, NodeDerivs

DISTURBANCE = math.sqrt(2.0 * np.finfo(float).eps)


# Jitted single-eval helpers (model passed as a pytree; cache persists
# across calls with the same model structure/shapes).
jit_calc = jax.jit(lambda m, x, u: m.calc(x, u))
jit_calc_diff = jax.jit(lambda m, x, u: m.calc_diff(x, u))
jit_calc_both = jax.jit(lambda m, x, u: m.calc_both(x, u))


@jax.jit
def _fd_first(model, x, u, h):
    """(Fx, Fu, Lx, Lu) by forward differences, columns vmapped."""
    st = model.state
    ndx, nu = st.ndx, model.nu
    xn0, c0 = model.calc(x, u)

    def colx(e):
        xn, c = model.calc(st.integrate(x, h * e), u)
        return st.diff(xn0, xn) / h, (c - c0) / h

    Fx_T, Lx = jax.vmap(colx)(jnp.eye(ndx, dtype=x.dtype))

    def colu(e):
        xn, c = model.calc(x, u + h * e)
        return st.diff(xn0, xn) / h, (c - c0) / h

    Fu_T, Lu = jax.vmap(colu)(jnp.eye(nu, dtype=u.dtype))
    return Fx_T.T, Fu_T.T, Lx, Lu


@jax.jit
def _fd_second(model, x, u, h):
    """(Lxx, Lxu, Luu) by FD on the FD cost gradient (all evals vmapped)."""
    st = model.state
    ndx, nu = st.ndx, model.nu
    ex = jnp.eye(ndx, dtype=x.dtype)
    eu = jnp.eye(nu, dtype=u.dtype)

    def grad(xq, uq):
        _, c = model.calc(xq, uq)
        gx = jax.vmap(
            lambda e: (model.calc(st.integrate(xq, h * e), uq)[1] - c) / h)(ex)
        gu = jax.vmap(lambda e: (model.calc(xq, uq + h * e)[1] - c) / h)(eu)
        return gx, gu

    gx0, gu0 = grad(x, u)
    gxi, gui = jax.vmap(lambda e: grad(st.integrate(x, h * e), u))(ex)
    Lxx = (gxi - gx0).T / h                       # (ndx, ndx)
    Lxu = (gui - gu0) / h                         # (ndx, nu)
    _, guu = jax.vmap(lambda e: grad(x, u + h * e))(eu)
    Luu = (guu - gu0).T / h
    return Lxx, Lxu, Luu


def numdiff_action(model: ActionModel, x, u, h: float = None) -> NodeDerivs:
    """FD Fx/Fu/Lx/Lu + FD-of-gradient Hessians (central-free forward FD,
    core/numdiff/action.hxx semantics)."""
    h = DISTURBANCE if h is None else h
    x = jnp.asarray(x)
    u = jnp.asarray(u)
    h = jnp.asarray(h, x.dtype)
    Fx, Fu, Lx, Lu = _fd_first(model, x, u, h)
    Lxx, Lxu, Luu = _fd_second(model, x, u, h)
    return NodeDerivs(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu,
                      Lxx=Lxx, Lxu=Lxu, Luu=Luu)


def numdiff_fxlx(model: ActionModel, x, u, h: float = 1e-6):
    """First-order FD (Fx, Fu, Lx, Lu) only — the cheap per-test oracle
    (core/numdiff/action.hxx:60-97 column construction).  Returns numpy."""
    Fx, Fu, Lx, Lu = _fd_first(model, jnp.asarray(x), jnp.asarray(u),
                               jnp.asarray(h, jnp.asarray(x).dtype))
    return (np.asarray(Fx), np.asarray(Fu), np.asarray(Lx), np.asarray(Lu))


@jax.jit
def _fd_state(state, x0, x1, h):
    ndx = state.ndx
    d0 = state.diff(x0, x1)
    e = jnp.eye(ndx, dtype=x0.dtype)
    J1 = jax.vmap(
        lambda ei: (state.diff(state.integrate(x0, h * ei), x1) - d0) / h)(e)
    J2 = jax.vmap(
        lambda ei: (state.diff(x0, state.integrate(x1, h * ei)) - d0) / h)(e)
    dx = d0
    y0 = state.integrate(x0, dx)
    Jx = jax.vmap(lambda ei: state.diff(
        y0, state.integrate(state.integrate(x0, h * ei), dx)) / h)(e)
    Jdx = jax.vmap(lambda ei: state.diff(
        y0, state.integrate(x0, dx + h * ei)) / h)(e)
    return J1.T, J2.T, Jx.T, Jdx.T


def numdiff_state(state, x0, x1, h: float = None):
    """FD Jdiff/Jintegrate (core/numdiff/state.hpp semantics): returns
    (Jdiff_first, Jdiff_second, Jint_x, Jint_dx) evaluated at (x0, x1) and
    (x0, dx=diff(x0,x1))."""
    h = DISTURBANCE if h is None else h
    x0 = jnp.asarray(x0)
    return _fd_state(state, x0, jnp.asarray(x1), jnp.asarray(h, x0.dtype))


def numdiff_actuation(actuation, x, u, h: float = None):
    """FD dtau_du for an actuation model (core/numdiff/actuation.hpp)."""
    h = DISTURBANCE if h is None else h
    tau0 = actuation.calc(x, u)
    nu = u.shape[0]
    cols = jax.vmap(
        lambda e: (actuation.calc(x, u + h * e) - tau0) / h)(
            jnp.eye(nu, dtype=jnp.asarray(u).dtype))
    return cols.T


def numdiff_activation(activation, r, h: float = None):
    """FD (Ar, Arr) for an activation (core/numdiff/activation.hpp)."""
    h = DISTURBANCE if h is None else h
    r = jnp.asarray(r)
    n = r.shape[0]
    a0, Ar0, _ = activation.calc(r)
    e = jnp.eye(n, dtype=r.dtype)
    Ar = jax.vmap(lambda ei: (activation.calc(r + h * ei)[0] - a0) / h)(e)
    Arr = jax.vmap(
        lambda ei: (activation.calc(r + h * ei)[1] - Ar0) / h)(e)
    return Ar, jnp.diagonal(Arr.T)


def numdiff_contact(contact, state, x, a=None, h: float = None):
    """FD derivatives of one contact model (the reference's
    ContactModelNumDiff, multibody/numdiff/contact.hpp): columns of
    ``da0_dx`` (nc, ndx) and of ``d(Jc·a)_dx`` (nc, ndx) for a fixed
    joint acceleration ``a`` — the two x-derivative blocks the contact
    dynamics consumes (contact-fwddyn.hxx:126-159).  Disturbance columns
    are taken along manifold tangents via ``state.integrate(x, h·e_i)``
    (core/numdiff/action.hxx:60-97 convention)."""
    from ..dynamics import algorithms as algo
    from ..models.multibody.nodes import NodeCache

    h = DISTURBANCE if h is None else h
    x = jnp.asarray(x)
    h = jnp.asarray(h, x.dtype)
    st = state
    nq = st.nq
    if a is None:
        a = jnp.zeros((st.nv,), x.dtype)

    def eval_at(xi):
        kin = algo.KinData(st.model, xi[:nq], xi[nq:])
        J, a0 = contact.calc(NodeCache(kin))
        return J, a0

    J0, a00 = eval_at(x)
    e = jnp.eye(st.ndx, dtype=x.dtype)

    def col(ei):
        Ji, a0i = eval_at(st.integrate(x, h * ei))
        return (a0i - a00) / h, (Ji - J0) @ a / h

    da0_cols, dJa_cols = jax.vmap(col)(e)
    return J0, a00, da0_cols.T, dJa_cols.T
