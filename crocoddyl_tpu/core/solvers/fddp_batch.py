"""Batch-native FDDP: the whole batched solve in lane layout.

`fddp.solve` is a single-problem program batched with `jax.vmap`.  That is
correct and fully general, but at benchmark batch sizes it leaves most of
the step time in vmap-of-scan mechanics: the per-step Riccati/rollout math
is tiny, XLA interleaves ~900 small scan-body ops per step, and vmapped
while_loops pay masked select/copies over their carries
(benchmarks/ROOFLINE.md round-5 accounting).

This module is the BATCH-NATIVE path: one solve program whose data
parallelism is the LANE axis of three Pallas kernels —

- node linearization: `ops/fused_node.lane_calc_both` over all B*T nodes
  (the same kernel the vmapped path uses, fed without the outer vmap);
- Riccati backward: `ops/fused_scans.riccati_backward_lanes` (grid over
  reversed time, per-step operands streamed HBM->VMEM, carry in scratch);
- trial rollout: `ops/fused_scans.trial_rollout_lanes` (grid over time).

Decision-equivalence with `fddp.solve` (same candidates, same accepted
steps, same reg schedule) is pinned by tests/test_fddp_batch.py; the
scope is the solver configuration the MPC/benchmark lane uses:
feasibility-driven FDDP, non-box, single-segment problems with
fused-node-supported structure, sequential line search, no trace.

Reference semantics: fddp.cpp:19-225 + ddp.cpp:41-326 (same citations as
core/solvers/fddp.py — this is a re-layout, not a re-derivation).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...dynamics.model import JointType
from ...ops import fused_node as _fn
from ...ops import fused_scans as _fsc
from .fddp import Solution, SolverSettings


def supports(problem, settings: SolverSettings) -> bool:
    """Trace-time gate (mirrors fused_scans.supports_problem + the solver
    features this path implements)."""
    s = settings
    if (s.box or not s.feasibility_driven or s.parallel_linesearch
            or s.parallel_riccati or s.ms_chunk or s.record_trace
            or s.iter_callback is not None):
        return False
    segs = problem.segments
    return len(segs) == 1 and _fn.supports(segs[0])


def _node_mode() -> str:
    m = _fn.fused_mode()
    # the lane body runs everywhere; 'off' (CPU default) falls back to the
    # plain-XLA lane trace rather than the vmapped generic path
    return "jnp" if m == "off" else m


@partial(jax.jit, static_argnames=("settings",))
def solve_batch(problem, x0s,
                xs_init: Optional[jax.Array] = None,
                us_init: Optional[jax.Array] = None,
                settings: SolverSettings = SolverSettings(),
                is_feasible: bool = False,
                reginit: Optional[float] = None) -> Solution:
    """Solve B instances of ``problem`` (one per row of x0s (B, nx)) with
    shared-or-per-problem warm starts; returns a Solution whose leaves
    carry a leading B axis.  Semantics == vmap(fddp.solve) over x0s for
    the supported configuration."""
    s = settings
    assert supports(problem, s), "unsupported config for solve_batch"
    seg = problem.segments[0]
    st = problem.state
    T = problem.T
    nx, ndx, nu, nq, nv = st.nx, st.ndx, problem.nu, st.nq, st.nv
    B = x0s.shape[0]
    dt = x0s.dtype
    has_ff = JointType(st.model.joint_types[0]) == JointType.FREE_FLYER
    mode = _node_mode()
    interp = mode != "pallas"

    # ---- lane-layout problem constants -----------------------------------
    x0_l = x0s.T                                        # (nx, B)
    if xs_init is None:
        xs_init = jnp.tile(x0s[:, None], (1, T + 1, 1))
    if us_init is None:
        us_init = jnp.zeros((B, T, nu), dt)
    if xs_init.ndim == 2:
        xs_init = jnp.broadcast_to(xs_init[None], (B, T + 1, nx))
    if us_init.ndim == 2:
        us_init = jnp.broadcast_to(us_init[None], (B, T, nu))
    xs_l0 = jnp.moveaxis(xs_init.astype(dt), 0, -1)     # (T+1, nx, B)
    us_l0 = jnp.moveaxis(us_init.astype(dt), 0, -1)     # (T, nu, B)

    # node-lane model params: (T, d...) -> (d..., T, B) -> (d..., T*B)
    seg_nodes = jax.tree.map(
        lambda l: jnp.broadcast_to(
            jnp.moveaxis(l, 0, -1)[..., None],
            l.shape[1:] + (T, B)).reshape(l.shape[1:] + (T * B,)),
        seg)

    def nodes_of(a_l):
        """(T, d, B) -> (d, T*B) (t-major node lanes)."""
        return jnp.moveaxis(a_l, 0, 1).reshape(a_l.shape[1], T * B)

    def unnodes(a_n):
        """(d, T*B) -> (T, d, B)."""
        return jnp.moveaxis(a_n.reshape(a_n.shape[0], T, B), 1, 0)

    reg0 = jnp.full((B,), s.regmin if reginit is None else reginit, dt)
    regfactor = jnp.asarray(s.regfactor, dt)
    regmin = jnp.asarray(s.regmin, dt)
    regmax = jnp.asarray(s.regmax, dt)
    alphas = jnp.asarray(s.alphas, dt)

    def lane_diff(xa_n, xb_n):
        return _fn._lane_state_diff(has_ff, nq, nv, xa_n, xb_n)[0]

    # ---- calc_diff + gaps (SolverDDP::calcDiff, ddp.cpp:157-178) ----------
    def calc_diff(xs_l, us_l, feasible):
        x_n = nodes_of(xs_l[:-1])
        u_n = nodes_of(us_l)
        derivs_n, xnext_n, cost_n = _fn.calc_both_lanes(
            seg_nodes, x_n, u_n, mode)
        derivs_l = jax.tree.map(
            lambda a: jnp.moveaxis(a.reshape(a.shape[:-1] + (T, B)),
                                   -2, 0), derivs_n)    # (T, ..., B)
        xnext_l = unnodes(xnext_n)                      # (T, nx, B)
        costs = cost_n.reshape(T, B).sum(0)             # (B,)
        # terminal node: B evaluations through the generic path
        dterm_b = jax.vmap(problem.terminal.calc_diff_terminal)(xs_l[-1].T)
        dterm_l = jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), dterm_b)
        cterm = jax.vmap(problem.terminal.calc_terminal)(xs_l[-1].T)
        cost = costs + cterm
        f0 = lane_diff(xs_l[0], x0_l)                   # (ndx, B)
        frest_n = lane_diff(nodes_of(xs_l[1:]), nodes_of(xnext_l))
        fs_l = jnp.concatenate([f0[None], unnodes(frest_n)], axis=0)
        fs_l = jnp.where(feasible[None, None], jnp.zeros_like(fs_l), fs_l)
        return derivs_l, dterm_l, fs_l, cost

    # ---- one solver iteration (fddp.cpp:34-105 semantics, per-lane) ------
    def iteration(c):
        (xs_l, us_l, feasible, was_feasible, xreg, ureg, cost,
         steplength, d0_o, d1_o, stop_o, it_b, conv, div, active) = c

        derivs_l, dterm_l, fs_l, cost_new = calc_diff(xs_l, us_l, feasible)
        cost = jnp.where(active, cost_new, cost)

        # reg escalation (ddp.cpp:56-70), common-case-one-pass form: run
        # the full backward at the current reg; only if some lane's
        # factorization failed, resolve the final reg with a scalar-carry
        # probe ladder and re-run the full pass (lax.cond — the predicate
        # is a true scalar here, so the untaken branch never executes).
        def bp_full(xr, ur):
            return _fsc.riccati_backward_lanes(
                derivs_l, dterm_l, fs_l, xr, ur, interpret=interp)

        def probe_failed(xr, ur):
            return bp_full(xr, ur)[-1]

        res0 = bp_full(xreg, ureg)
        pend0 = res0[-1] & (xreg < regmax)
        xreg1 = jnp.where(pend0, jnp.minimum(xreg * regfactor, regmax),
                          xreg)

        def r_cond(cc):
            return cc[2].any()

        def r_body(cc):
            xr, ur, pend = cc
            failed = probe_failed(xr, ur) & pend
            can = failed & (xr < regmax)
            xr = jnp.where(can, jnp.minimum(xr * regfactor, regmax), xr)
            return (xr, xr, can)

        xreg_n, ureg_n, _ = jax.lax.while_loop(
            r_cond, r_body, (xreg1, xreg1, pend0))
        xreg_m = jnp.where(active, xreg_n, xreg)
        ureg_m = jnp.where(active, ureg_n, ureg)
        res = jax.lax.cond(
            ((xreg_m != xreg) | (ureg_m != ureg)).any(),
            lambda: bp_full(xreg_m, ureg_m), lambda: res0)
        xreg, ureg = xreg_m, ureg_m
        (Vx_l, Vxx_l, Qu_l, k_l, K_l, Quuk_l, failed) = res
        div = div | (active & failed)

        # expected improvement (fddp.cpp:126-147)
        dg = (Qu_l * k_l).sum((0, 1)) - (Vx_l * fs_l).sum((0, 1))
        Vxx_fs = (Vxx_l * fs_l[:, None]).sum(2)         # (T+1, ndx, B)
        dq = -(k_l * Quuk_l).sum((0, 1)) + (fs_l * Vxx_fs).sum((0, 1))

        # sequential line search, GLOBAL alpha ladder with per-lane
        # acceptance (decision-equivalent to the vmapped per-problem
        # early-exit: each lane takes its own first acceptable alpha)
        fs_fwd = fs_l

        def trial(alpha):
            xs_r, us_r, x_last, cost_r, fail_t = _fsc.trial_rollout_lanes(
                seg, x0_l, xs_l[:-1], us_l, k_l, K_l, fs_fwd[:-1],
                fs_fwd[-1], alpha, interpret=interp)
            xT = _fn.lane_integrate(has_ff, nq, nv, x_last,
                                    (alpha - 1.0) * fs_fwd[-1])
            cterm = jax.vmap(problem.terminal.calc_terminal)(xT.T)
            cost_try = cost_r + cterm
            fail_t = fail_t | ~(jnp.abs(cost_try) < 1e30)
            xs_try = jnp.concatenate([xs_r, xT[None]], axis=0)
            dV = cost - cost_try
            fail_t = fail_t | (cost_try > s.th_blowup * (1.0 + jnp.abs(cost)))
            # dx over ALL T+1 states, folded into node lanes
            fold = lambda a_l: jnp.moveaxis(a_l, 1, 0).reshape(
                a_l.shape[1], (T + 1) * B)
            dx_n = lane_diff(fold(xs_try), fold(xs_l))
            dx_l = jnp.moveaxis(
                dx_n.reshape(ndx, T + 1, B), 1, 0)      # (T+1, ndx, B)
            dv = -(fs_l * ((Vxx_l * dx_l[:, None]).sum(2))).sum((0, 1))
            d0 = dg + dv
            d1 = dq - 2.0 * dv
            dVexp = alpha * (d0 + 0.5 * alpha * d1)
            pos = (dVexp >= 0) & ((d0 < s.th_grad)
                                  | (dV > s.th_acceptstep * dVexp))
            neg = (dVexp < 0) & (dV > s.th_acceptnegstep * dVexp)
            accept = (pos | neg) & ~fail_t
            return xs_try, us_r, cost_try, accept, d0, d1

        def ls_cond(cc):
            i, acc = cc[0], cc[1]
            return (i < s.n_alphas) & (~acc & active).any()

        def ls_body(cc):
            (i, acc, xs_a, us_a, cost_a, step_a, d0_a, d1_a) = cc
            alpha = alphas[i]
            xs_try, us_try, cost_try, accept, d0, d1 = trial(alpha)
            take = ~acc & accept & active
            xs_a = jnp.where(take[None, None], xs_try, xs_a)
            us_a = jnp.where(take[None, None], us_try, us_a)
            cost_a = jnp.where(take, cost_try, cost_a)
            step_a = jnp.where(take, alpha, step_a)
            d0_a = jnp.where(take, d0, d0_a)
            d1_a = jnp.where(take, d1, d1_a)
            return (i + 1, acc | accept, xs_a, us_a, cost_a, step_a,
                    d0_a, d1_a)

        ls0 = (jnp.zeros((), jnp.int32), jnp.zeros((B,), bool),
               xs_l, us_l, cost, jnp.full((B,), alphas[-1], dt),
               d0_o, d1_o)
        (_, any_acc, xs_a, us_a, cost_a, step_a, d0_a, d1_a) = \
            jax.lax.while_loop(ls_cond, ls_body, ls0)

        upd = any_acc & active
        xs_l = jnp.where(upd[None, None], xs_a, xs_l)
        us_l = jnp.where(upd[None, None], us_a, us_l)
        cost = jnp.where(upd, cost_a, cost)
        steplength = jnp.where(active, step_a, steplength)
        d0_o = jnp.where(active, d0_a, d0_o)
        d1_o = jnp.where(active, d1_a, d1_o)
        feas_new = was_feasible | (step_a == 1.0)
        was_feasible = jnp.where(upd, feasible, was_feasible)
        feasible = jnp.where(upd, feas_new, feasible)

        # regularization schedule (ddp.cpp:95-104)
        dec = step_a > s.th_stepdec
        inc = step_a <= s.th_stepinc
        xreg_a = jnp.where(dec, jnp.maximum(xreg / regfactor, regmin), xreg)
        xreg_a = jnp.where(inc, jnp.minimum(xreg_a * regfactor, regmax),
                           xreg_a)
        div = div | (active & inc & (xreg_a >= regmax))
        xreg = jnp.where(active, xreg_a, xreg)
        ureg = xreg

        stop = (Qu_l ** 2).sum((0, 1))
        stop_o = jnp.where(active, stop, stop_o)
        conv_new = was_feasible & (stop < s.th_stop)
        conv = jnp.where(active, conv_new, conv)
        it_b = jnp.where(active, it_b + 1, it_b)
        active = (it_b < s.maxiter) & ~conv & ~div
        return (xs_l, us_l, feasible, was_feasible, xreg, ureg, cost,
                steplength, d0_o, d1_o, stop_o, it_b, conv, div, active)

    state0 = (xs_l0, us_l0,
              jnp.full((B,), bool(is_feasible)),
              jnp.zeros((B,), bool), reg0, reg0, jnp.zeros((B,), dt),
              jnp.ones((B,), dt), jnp.zeros((B,), dt), jnp.zeros((B,), dt),
              jnp.full((B,), jnp.inf, dt),
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
              jnp.zeros((B,), bool), jnp.ones((B,), bool))

    if s.maxiter == 1:
        final = iteration(state0)
    else:
        final = jax.lax.while_loop(lambda c: c[-1].any(), iteration, state0)

    (xs_l, us_l, feasible, was_feasible, xreg, ureg, cost, steplength,
     d0_o, d1_o, stop_o, it_b, conv, div, _) = final

    # final direction at the returned candidate (Solution contract of
    # fddp.solve's multi-iteration path)
    derivs_l, dterm_l, fs_l, _ = calc_diff(xs_l, us_l, feasible)
    (Vx_l, Vxx_l, Qu_l, k_l, K_l, _, _) = _fsc.riccati_backward_lanes(
        derivs_l, dterm_l, fs_l, xreg, ureg, interpret=interp)

    def tob(a_l):
        return jnp.moveaxis(a_l, -1, 0)

    return Solution(
        xs=tob(xs_l), us=tob(us_l), K=tob(K_l), k=tob(k_l),
        Vx=tob(Vx_l), Vxx=tob(Vxx_l), Qu=tob(Qu_l), fs=tob(fs_l),
        cost=cost, stop=stop_o, xreg=xreg, ureg=ureg,
        steplength=steplength, d0=d0_o, d1=d1_o, iter=it_b,
        is_feasible=feasible, converged=conv, diverged=div, trace=None)
