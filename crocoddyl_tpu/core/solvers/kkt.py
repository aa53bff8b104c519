"""Dense full-space KKT solver (equality-constrained Newton).

Reference: src/core/solvers/kkt.cpp.  Assembles the (np+nd)² KKT system

    [ H   Aᵀ ] [ primal ]   = - [ grad ]
    [ A   0  ] [ dual   ]       [ defect ]

with H the block Hessian (Lxx/Lxu/Luu per node), A the linearized dynamics
constraints (I on each state block, −Fx/−Fu couplings), solved by dense LU.
Used as the ground-truth oracle for DDP tests, exactly like the reference's
``test_solver_against_kkt_solver`` (unittest/test_solvers.cpp:65).

Uniform ndx/nu per node is assumed (the stacked-model problem layout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..problem import ShootingProblem


class KKTSolution(struct.PyTreeNode):
    xs: jax.Array
    us: jax.Array
    dxs: jax.Array       # (T+1, ndx) primal state steps
    dus: jax.Array       # (T, nu) primal control steps
    lambdas: jax.Array   # (T+1, ndx) duals
    cost: jax.Array
    stop: jax.Array
    iter: jax.Array
    converged: jax.Array


def _assemble(problem: ShootingProblem, xs, us, derivs, dterm):
    st = problem.state
    T = problem.T
    ndx, nu = st.ndx, problem.running.nu
    np_, nd = ndx * (T + 1) + nu * T, ndx * (T + 1)
    dt = xs.dtype

    H = jnp.zeros((np_, np_), dt)
    grad = jnp.zeros((np_,), dt)
    A = jnp.zeros((nd, np_), dt)
    defect = jnp.zeros((nd,), dt)

    ix = jnp.arange(ndx)
    # State Hessian/gradient blocks (running + terminal)
    Lxx_all = jnp.concatenate([derivs.Lxx, dterm.Lxx[None]], axis=0)
    Lx_all = jnp.concatenate([derivs.Lx, dterm.Lx[None]], axis=0)
    for t in range(T + 1):
        sl = slice(t * ndx, (t + 1) * ndx)
        H = H.at[sl, sl].set(Lxx_all[t])
        grad = grad.at[sl].set(Lx_all[t])
    off = ndx * (T + 1)
    for t in range(T):
        sx = slice(t * ndx, (t + 1) * ndx)
        su = slice(off + t * nu, off + (t + 1) * nu)
        H = H.at[sx, su].set(derivs.Lxu[t])
        H = H.at[su, sx].set(derivs.Lxu[t].T)
        H = H.at[su, su].set(derivs.Luu[t])
        grad = grad.at[su].set(derivs.Lu[t])

    # Constraints: dx_0 = −(xs0 ⊖ x0);  dx_{t+1} − Fx dx_t − Fu du_t = −gap
    A = A.at[:ndx * (T + 1), :ndx * (T + 1)].set(jnp.eye(nd, dtype=dt))
    xnexts, costs = problem.calc(xs, us)
    defect = defect.at[0:ndx].set(st.diff(problem.x0.astype(dt), xs[0]))
    for t in range(T):
        r = slice((t + 1) * ndx, (t + 2) * ndx)
        sx = slice(t * ndx, (t + 1) * ndx)
        su = slice(off + t * nu, off + (t + 1) * nu)
        A = A.at[r, sx].set(-derivs.Fx[t])
        A = A.at[r, su].set(-derivs.Fu[t])
        defect = defect.at[r].set(st.diff(xnexts[t], xs[t + 1]))

    cost = jnp.sum(costs)
    return H, grad, A, defect, cost


@partial(jax.jit, static_argnames=("maxiter", "th_acceptstep", "th_stop",
                                   "th_grad", "n_alphas"))
def solve(problem: ShootingProblem,
          xs_init: Optional[jax.Array] = None,
          us_init: Optional[jax.Array] = None,
          maxiter: int = 100,
          is_feasible: bool = False,
          th_acceptstep: float = 0.1,
          th_stop: float = 1e-9,
          th_grad: float = 1e-12,
          n_alphas: int = 10) -> KKTSolution:
    st = problem.state
    T = problem.T
    ndx, nu = st.ndx, problem.running.nu
    x0 = problem.x0
    dt = x0.dtype
    if xs_init is None:
        xs_init = jnp.tile(x0[None], (T + 1, 1))
    if us_init is None:
        us_init = jnp.zeros((T, nu), dtype=dt)
    np_ = ndx * (T + 1) + nu * T
    alphas = jnp.asarray([2.0 ** (-k) for k in range(n_alphas)], dt)

    def iteration(carry):
        xs, us, cost_prev, feasible, was_feasible, it, conv, stop = carry
        derivs, dterm = problem.calc_diff(xs, us)
        H, grad, A, defect, cost = _assemble(problem, xs, us, derivs, dterm)

        nd = defect.shape[0]
        KKT = jnp.zeros((np_ + nd, np_ + nd), dt)
        KKT = KKT.at[:np_, :np_].set(H)
        KKT = KKT.at[np_:, :np_].set(A)
        KKT = KKT.at[:np_, np_:].set(A.T)
        rhs = -jnp.concatenate([grad, defect])
        sol = jnp.linalg.solve(KKT, rhs)
        primal, dual = sol[:np_], sol[np_:]
        dxs = primal[:ndx * (T + 1)].reshape(T + 1, ndx)
        dus = primal[ndx * (T + 1):].reshape(T, nu)

        d0 = -grad @ primal
        d1 = -(primal @ (H @ primal))

        def trial(alpha):
            xs_try = jax.vmap(st.integrate)(xs, alpha * dxs)
            us_try = us + alpha * dus
            _, costs = problem.calc(xs_try, us_try)
            cost_try = jnp.sum(costs)
            dV = cost - cost_try
            dVexp = alpha * d0 + 0.5 * alpha * alpha * d1
            accept = ((d0 < th_grad) | ~feasible
                      | (dV > th_acceptstep * dVexp))
            accept = accept & ~jnp.isnan(cost_try)
            return xs_try, us_try, cost_try, accept

        xs_t, us_t, cost_t, acc = jax.vmap(trial)(alphas)
        any_acc = acc.any()
        idx = jnp.argmax(acc)
        xs_new = jnp.where(any_acc, xs_t[idx], xs)
        us_new = jnp.where(any_acc, us_t[idx], us)
        cost_new = jnp.where(any_acc, cost_t[idx], cost)
        was_feasible = jnp.where(any_acc, feasible, was_feasible)
        feasible = jnp.where(any_acc, jnp.ones((), bool), feasible)

        # Lagrangian-stationarity stopping criterion (kkt.cpp:128-149)
        lam = dual.reshape(T + 1, ndx)
        dF_x = lam[:-1] - jnp.einsum("tij,ti->tj", derivs.Fx, lam[1:])
        dF_u = -jnp.einsum("tij,ti->tj", derivs.Fu, lam[1:])
        res_x = grad[:ndx * (T + 1)].reshape(T + 1, ndx) + jnp.concatenate(
            [dF_x, lam[-1][None]], axis=0)
        res_u = grad[ndx * (T + 1):].reshape(T, nu) + dF_u
        stop = (jnp.sum(res_x ** 2) + jnp.sum(res_u ** 2)
                + jnp.sum(defect ** 2))
        conv = was_feasible & (stop < th_stop)
        return xs_new, us_new, cost_new, feasible, was_feasible, it + 1, conv, stop

    def cond(carry):
        _, _, _, _, _, it, conv, _ = carry
        return (it < maxiter) & ~conv

    init = (xs_init.astype(dt), us_init.astype(dt), jnp.zeros((), dt),
            jnp.asarray(is_feasible), jnp.zeros((), bool),
            jnp.zeros((), jnp.int32), jnp.zeros((), bool),
            jnp.asarray(jnp.inf, dt))
    xs, us, cost, feasible, was_feasible, it, conv, stop = jax.lax.while_loop(
        cond, iteration, init)

    return KKTSolution(
        xs=xs, us=us,
        dxs=jnp.zeros((T + 1, ndx), dt), dus=jnp.zeros((T, nu), dt),
        lambdas=jnp.zeros((T + 1, ndx), dt),
        cost=cost, stop=stop, iter=it, converged=conv)
