"""DDP / FDDP solvers — fully jitted, branchless, batchable.

Reference semantics reproduced exactly from:
  - src/core/solvers/ddp.cpp   (SolverDDP: solve/backwardPass/forwardPass/
    computeGains/expectedImprovement/regularization schedule)
  - src/core/solvers/fddp.cpp  (SolverFDDP: gap-aware expected improvement,
    gap-contracting forward pass, negative-step acceptance)

TPU-native design notes
-----------------------
* The reference's exception-driven control flow (non-PD Cholesky / NaN ⇒
  throw ⇒ regularization escalation ×10; NaN rollout ⇒ skip that α) becomes
  branchless: failure flags are carried through ``lax.scan``/``lax.while_loop``
  and escalation is a masked retry loop (ddp.cpp:56-70).
* The two forward-pass branches (fddp.cpp:159-224) collapse into one formula:
  ``xs_try[t] = integrate(xnext, (α−1)·fs[t])`` — with gaps fs≡0 (feasible) or
  α=1 this reduces to the plain rollout, which is exactly the reference's
  feasible branch.  DDP is the special case fs≡0 in the rollout plus its own
  acceptance rule.
* The 10-candidate backtracking line search (alphas 2^0..2^-9, ddp.cpp:27-31)
  is evaluated in parallel with ``vmap`` over α and the first acceptable step
  is selected — decision-equivalent to the reference's sequential early-exit
  loop because each α's acceptance test is independent of the others.
* The per-node derivative evaluation (OpenMP loop in shooting.hxx:163-196) is
  a ``vmap`` over the horizon; the Riccati recursion (ddp.cpp:180-253) is a
  ``lax.scan`` over reversed time with dense (ndx,ndx) blocks, which XLA maps
  onto the MXU once batched over problem instances.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ...ops import smallchol as _sc
from ..problem import ShootingProblem


def _bad(x) -> jax.Array:
    """The reference's raiseIfNaN predicate (solver-base.cpp:175-178):
    true for NaN, inf, or magnitude >= 1e30.  ``~(|x| < 1e30)`` covers all
    three in one comparison (NaN compares false)."""
    return ~(jnp.max(jnp.abs(x)) < 1e30)


class SolverSettings(struct.PyTreeNode):
    """Static solver configuration (all fields hashable/static).

    Defaults mirror SolverAbstract / SolverDDP / SolverFDDP constructors
    (solver-base.cpp:24-25, ddp.cpp:16-31, fddp.cpp:15).
    """

    maxiter: int = struct.field(pytree_node=False, default=100)
    feasibility_driven: bool = struct.field(pytree_node=False, default=True)
    th_acceptstep: float = struct.field(pytree_node=False, default=0.1)
    th_stop: float = struct.field(pytree_node=False, default=1e-9)
    th_grad: float = struct.field(pytree_node=False, default=1e-12)
    th_stepdec: float = struct.field(pytree_node=False, default=0.5)
    th_stepinc: float = struct.field(pytree_node=False, default=0.01)
    th_acceptnegstep: float = struct.field(pytree_node=False, default=2.0)
    # relative trial-cost blowup guard: a trial whose cost exceeds
    # th_blowup·(1+|cost|) is rejected like a NaN rollout.  The reference
    # only rejects at the absolute raiseIfNaN bound (1e30,
    # solver-base.cpp:175-178), which lets the negative-step rule
    # (fddp.cpp:72-80) accept astronomically-worse trials on chaotic
    # problems (e.g. cartpole swing-up rollouts at alpha=1); a relative
    # bound keeps the backtracking behavior without changing any
    # well-behaved solve (normal accepted steps never increase cost 1e6x).
    th_blowup: float = struct.field(pytree_node=False, default=1e6)
    regfactor: float = struct.field(pytree_node=False, default=10.0)
    regmin: float = struct.field(pytree_node=False, default=1e-9)
    regmax: float = struct.field(pytree_node=False, default=1e9)
    n_alphas: int = struct.field(pytree_node=False, default=10)
    # True: evaluate all alphas at once (vmap) and pick the first acceptable —
    # maximal parallelism, 10x rollout FLOPs.  False: sequential early-exit
    # backtracking exactly like the reference (ddp.cpp:78-94) via
    # lax.while_loop — the usual choice on TPU where the accepted step is
    # almost always among the first alphas.
    parallel_linesearch: bool = struct.field(pytree_node=False, default=True)
    # Horizon-parallel Riccati backward pass (associative scan, O(log T)
    # depth — see solvers/parallel_riccati.py).  Latency lever for long
    # horizons / small batches; float32-only on TPU (element combines LU).
    parallel_riccati: bool = struct.field(pytree_node=False, default=False)
    # Multiple-shooting forward pass: split each model segment into chunks of
    # at most ms_chunk knots and roll them out IN PARALLEL, each chunk
    # starting from the candidate's own reconstruction of the previous
    # rollout state integrate(xs[t0], fs[t0]).  Chunk-boundary defects become
    # ordinary FDDP gaps (fs is recomputed every iteration), which the
    # feasibility-driven machinery contracts — the rollout latency drops from
    # T sequential node evaluations to ~ms_chunk.  0 = exact sequential
    # rollout (reference semantics).  With ms_chunk > 0 feasibility is
    # declared only when a full step is taken AND the candidate gaps are
    # below th_gaptol (a full-step rollout no longer closes gaps exactly).
    ms_chunk: int = struct.field(pytree_node=False, default=0)
    th_gaptol: float = struct.field(pytree_node=False, default=1e-7)
    # Fuse the two sequential scans (Riccati backward + trial rollout)
    # into single Pallas kernels (ops/fused_scans.py): the whole T-loop
    # runs inside one kernel, removing per-step launch/bookkeeping
    # overhead — the b=1 MPC latency lever.  Applies to non-box,
    # single-segment problems with fused-node-supported structure;
    # silently falls back otherwise.  Compiled on TPU, interpreted
    # elsewhere (tests).
    fused_scans: bool = struct.field(pytree_node=False, default=False)
    # During-solve diagnostics hook (the reference's CallbackDisplay /
    # CallbackVerbose slot, bindings __init__.py:345): a Python callable
    # ``cb(iter, cost, xs)`` invoked EVERY solver iteration from inside the
    # jitted loop via jax.debug.callback (async, host-side; values arrive
    # as numpy arrays).  Pair with io.display.CallbackDisplay to render the
    # candidate every N iterations.  None = no callback (no tracing cost).
    iter_callback: Optional[object] = struct.field(pytree_node=False,
                                                   default=None)
    # lax.scan unroll factor for the Riccati backward recursion and the
    # rollout scans.  The per-iteration math at robot sizes (ndx=36) is far
    # below the TPU's launch/loop overhead, so merging k steps per while
    # iteration cuts the loop bookkeeping + carry copies ~k× at the cost of
    # a k× larger loop body (compile time).  1 = reference-shaped loops.
    scan_unroll: int = struct.field(pytree_node=False, default=1)
    record_trace: bool = struct.field(pytree_node=False, default=True)
    # Box-constrained variants (SolverBoxDDP/BoxFDDP; box-ddp.cpp:16-28):
    # per-node BoxQP over du bounds, clamped forward pass, th_stop 5e-5.
    box: bool = struct.field(pytree_node=False, default=False)
    qp_maxiter: int = struct.field(pytree_node=False, default=100)
    qp_th_acceptstep: float = struct.field(pytree_node=False, default=0.1)
    qp_th_grad: float = struct.field(pytree_node=False, default=1e-5)
    qp_reg: float = struct.field(pytree_node=False, default=0.0)

    @property
    def alphas(self):
        return [1.0 / (2.0 ** n) for n in range(self.n_alphas)]


class Trace(struct.PyTreeNode):
    """Per-iteration diagnostics — the CallbackVerbose columns
    (src/core/utils/callbacks.cpp: iter/cost/stop/grad(−d1)/xreg/ureg/step/feas)."""

    cost: jax.Array
    stop: jax.Array
    grad: jax.Array
    xreg: jax.Array
    ureg: jax.Array
    steplength: jax.Array
    feasible: jax.Array


class Solution(struct.PyTreeNode):
    """Solver output; field names follow the reference getters
    (solver-base.hpp:174-227, ddp.hpp:188-236)."""

    xs: jax.Array          # (T+1, nx)
    us: jax.Array          # (T, nu)
    K: jax.Array           # (T, nu, ndx) feedback gains
    k: jax.Array           # (T, nu) feedforward
    Vx: jax.Array          # (T+1, ndx)
    Vxx: jax.Array         # (T+1, ndx, ndx)
    Qu: jax.Array          # (T, nu)
    fs: jax.Array          # (T+1, ndx) defect gaps
    cost: jax.Array
    stop: jax.Array
    xreg: jax.Array
    ureg: jax.Array
    steplength: jax.Array
    d0: jax.Array          # expected improvement, linear term
    d1: jax.Array          # expected improvement, quadratic term
    iter: jax.Array
    is_feasible: jax.Array
    converged: jax.Array
    diverged: jax.Array
    trace: Optional[Trace] = None


class _IterState(struct.PyTreeNode):
    xs: jax.Array
    us: jax.Array
    feasible: jax.Array       # is_feasible_
    was_feasible: jax.Array
    xreg: jax.Array
    ureg: jax.Array
    cost: jax.Array
    # derivatives at candidate
    derivs: object            # NodeDerivs stacked (T, ...)
    dterm: object             # terminal NodeDerivs
    fs: jax.Array             # (T+1, ndx)
    # direction
    Vx: jax.Array
    Vxx: jax.Array
    Qu: jax.Array
    k: jax.Array
    K: jax.Array
    Quuk: jax.Array
    dg: jax.Array
    dq: jax.Array
    d0: jax.Array
    d1: jax.Array
    stop: jax.Array
    steplength: jax.Array
    iter: jax.Array
    converged: jax.Array
    diverged: jax.Array
    trace: Optional[Trace]


# ----------------------------------------------------------------------------
# Backward pass (Riccati recursion) — ddp.cpp:180-253, computeGains:298-310
# ----------------------------------------------------------------------------

def _backward_pass(derivs, dterm, fs, xreg, ureg, box_args=None,
                   probe=False, unroll=1):
    """``box_args`` enables the BoxDDP/BoxFDDP gain computation
    (box-ddp.cpp:46-75): (us, u_lb, u_ub, k_warm, feasible, qp_settings).

    ``probe=True`` returns only the failure flag (the scan carries just
    (Vx, Vxx, failed) and stacks nothing) — used by the regularization
    escalation sweep, where many candidate regs are probed in one vmapped
    pass without materializing per-candidate gain trajectories."""
    dt = fs.dtype
    ndx = fs.shape[-1]
    eye = jnp.eye(ndx, dtype=dt)

    Vxx_T = dterm.Lxx + xreg * eye
    Vx_T = dterm.Lx + Vxx_T @ fs[-1]
    failed0 = _bad(Vx_T) | _bad(Vxx_T)

    if box_args is not None:
        from . import boxqp
        us, u_lb, u_ub, k_warm, feasible, qp_kw = box_args

    def step(carry, inp):
        Vx_n, Vxx_n, failed = carry
        if box_args is None:
            d, f = inp
        else:
            d, f, u_t, lb_t, ub_t, kw_t = inp
        FxT_Vxx = d.Fx.T @ Vxx_n
        Qxx = d.Lxx + FxT_Vxx @ d.Fx
        Qx = d.Lx + d.Fx.T @ Vx_n
        Qxu = d.Lxu + FxT_Vxx @ d.Fu
        Quu = d.Luu + d.Fu.T @ Vxx_n @ d.Fu
        Quu = Quu + ureg * jnp.eye(Quu.shape[-1], dtype=dt)
        Qu = d.Lu + d.Fu.T @ Vx_n

        # Jacobi-equilibrated Cholesky: solve (D⁻¹QuuD⁻¹)y = D⁻¹b with
        # D = √diag(Quu).  Equilibration leaves exact arithmetic unchanged
        # but keeps the factorization well-scaled in float32, where the
        # raw Quu (cost weights up to 1e6-1e7 in the gait problems) spans
        # too many orders of magnitude for a stable factorization.
        dscale = jnp.sqrt(jnp.maximum(jnp.diag(Quu), 1e-30))
        Quu_eq = Quu / dscale[:, None] / dscale[None, :]
        chol = _sc.chol(Quu_eq)
        failed = failed | jnp.isnan(chol).any()

        def chol_solve(b):
            y = _sc.cho_solve(
                chol, b / dscale[..., :, None] if b.ndim == 2
                else b / dscale)
            return y / dscale[..., :, None] if b.ndim == 2 else y / dscale

        K = chol_solve(Qxu.T)
        kvec = chol_solve(Qu)

        if box_args is not None:
            # BoxQP over the step bounds, warm-started with the previous
            # feedforward (box-ddp.cpp:52-57); applied only on nodes with
            # control limits and once feasible, as in the reference.
            du_lb, du_ub = lb_t - u_t, ub_t - u_t
            qsol = boxqp.solve(Quu, Qu, du_lb, du_ub, kw_t, **qp_kw)
            has_limits = jnp.isfinite(lb_t).any() | jnp.isfinite(ub_t).any()
            use_box = has_limits & feasible
            K_box = qsol.Hff_inv @ Qxu.T
            k_box = -qsol.x
            Qu_box = jnp.where(qsol.free, Qu, jnp.zeros_like(Qu))
            K = jnp.where(use_box, K_box, K)
            kvec = jnp.where(use_box, k_box, kvec)
            Qu = jnp.where(use_box, Qu_box, Qu)
            failed = failed | (use_box & qsol.failed)
        Quuk = Quu @ kvec

        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
        Vxx = Vxx + xreg * eye
        Vx = Vx + Vxx @ f

        failed = failed | _bad(Vx) | _bad(Vxx)  # ddp.cpp:246-251
        out = None if probe else (Vx, Vxx, Qu, kvec, K, Quuk)
        return (Vx, Vxx, failed), out

    if box_args is None:
        xs_in = (derivs, fs[:-1])
    else:
        xs_in = (derivs, fs[:-1], us, u_lb, u_ub, k_warm)
    (_, _, failed), outs = jax.lax.scan(
        step, (Vx_T, Vxx_T, failed0), xs_in, reverse=True, unroll=unroll)
    if probe:
        return failed
    Vx_r, Vxx_r, Qu, kvec, K, Quuk = outs
    Vx = jnp.concatenate([Vx_r, Vx_T[None]], axis=0)
    Vxx = jnp.concatenate([Vxx_r, Vxx_T[None]], axis=0)
    return Vx, Vxx, Qu, kvec, K, Quuk, failed


# ----------------------------------------------------------------------------
# Forward pass — unified fddp.cpp:149-237 / ddp.cpp:255-296
# ----------------------------------------------------------------------------

def _forward_pass(problem: ShootingProblem, xs, us, k, K, fs, alpha,
                  u_lb=None, u_ub=None, unroll=1):
    """One trial rollout at step length ``alpha``.

    ``fs`` must already be zeroed for the feasible / plain-DDP case; then this
    is exactly the reference's feasible branch.  With bounds given, controls
    are clamped as in SolverBoxDDP::forwardPass (box-ddp.cpp:95-97).
    """
    st = problem.state
    gap_scale = alpha - 1.0
    if u_lb is None:
        u_lb = jnp.full_like(us, -jnp.inf)
        u_ub = jnp.full_like(us, jnp.inf)

    def step(carry, inp):
        xnext, cost_try, failed = carry
        m, x_ref, u_ref, kv, Kv, f, lb_t, ub_t = inp
        x_try = st.integrate(xnext, gap_scale * f)
        dx = st.diff(x_ref, x_try)
        u_try = u_ref - alpha * kv - Kv @ dx
        u_try = jnp.clip(u_try, lb_t, ub_t)
        xnext_new, c = m.calc(x_try, u_try)
        cost_try = cost_try + c
        # raiseIfNaN semantics (fddp.cpp:172-180): NaN, inf, or >=1e30
        # in the accumulated cost or rollout state rejects this alpha
        failed = failed | _bad(cost_try) | _bad(xnext_new)
        return (xnext_new, cost_try, failed), (x_try, u_try)

    dt = xs.dtype
    carry = (problem.x0.astype(dt), jnp.zeros((), dt), jnp.zeros((), bool))
    xs_parts, us_parts = [], []
    for seg, (i, j) in zip(problem.segments, problem._seg_slices()):
        carry, (xs_s, us_s) = jax.lax.scan(
            step, carry, (seg, xs[i:j], us[i:j], k[i:j], K[i:j],
                          fs[i:j], u_lb[i:j], u_ub[i:j]), unroll=unroll)
        xs_parts.append(xs_s)
        us_parts.append(us_s)
    xnext, cost_try, failed = carry
    xs_try = jnp.concatenate(xs_parts, axis=0)
    us_try = jnp.concatenate(us_parts, axis=0)

    xT_try = st.integrate(xnext, gap_scale * fs[-1])
    cost_try = cost_try + problem.terminal.calc_terminal(xT_try)
    failed = failed | _bad(cost_try)
    xs_try = jnp.concatenate([xs_try, xT_try[None]], axis=0)
    return xs_try, us_try, cost_try, failed


def _forward_pass_ms(problem: ShootingProblem, xs, us, k, K, fs, alpha,
                     ms_chunk, u_lb=None, u_ub=None):
    """Multiple-shooting trial rollout: chunks of <= ms_chunk knots roll out
    in parallel (vmapped scan), each starting from the candidate's
    reconstruction of the incoming rollout state integrate(xs[t0], fs[t0])
    — which equals x0 exactly at t0=0 (fs[0] = diff(xs[0], x0)) and the
    previous node's xnext at interior boundaries.  Only the per-chunk
    recursion is sequential, so the rollout depth is ~ms_chunk instead of T.
    Chunk-boundary mismatches surface as the next iteration's gaps, which
    FDDP's infeasible machinery absorbs (fddp.cpp:192-224 semantics applied
    blockwise)."""
    st = problem.state
    gap_scale = alpha - 1.0
    if u_lb is None:
        u_lb = jnp.full_like(us, -jnp.inf)
        u_ub = jnp.full_like(us, jnp.inf)
    dt = xs.dtype

    def step(carry, inp):
        xnext, cost_try, failed = carry
        m, x_ref, u_ref, kv, Kv, f, lb_t, ub_t = inp
        x_try = st.integrate(xnext, gap_scale * f)
        dx = st.diff(x_ref, x_try)
        u_try = u_ref - alpha * kv - Kv @ dx
        u_try = jnp.clip(u_try, lb_t, ub_t)
        xnext_new, c = m.calc(x_try, u_try)
        cost_try = cost_try + c
        failed = failed | _bad(cost_try) | _bad(xnext_new)
        return (xnext_new, cost_try, failed), (x_try, u_try)

    def run_chunked(seg, i, j):
        """Returns (xs_parts, us_parts, cost, failed, x_carry_out)."""
        L = j - i
        c = min(ms_chunk, L)
        n_c = L // c
        r = L - n_c * c

        def chunk_scan(seg_part, lo, hi, starts):
            """Batched scan over chunks [(lo + s*c, +c) for s]."""
            n = len(starts)
            clen = (hi - lo) // n
            x_start = jax.vmap(
                lambda t0: st.integrate(xs[t0], fs[t0]))(jnp.asarray(starts))
            resh = lambda a: jnp.swapaxes(
                a.reshape((n, clen) + a.shape[1:]), 0, 1)
            seg_r = jax.tree.map(
                lambda a: (resh(a) if hasattr(a, "ndim") and a.ndim
                           and a.shape[0] == hi - lo else a), seg_part)
            carry0 = (x_start, jnp.zeros((n,), dt), jnp.zeros((n,), bool))

            def body(carry, inp):
                return jax.vmap(step)(carry, inp)

            carry, (xs_s, us_s) = jax.lax.scan(
                body, carry0,
                (seg_r, resh(xs[lo:hi]), resh(us[lo:hi]), resh(k[lo:hi]),
                 resh(K[lo:hi]), resh(fs[lo:hi]), resh(u_lb[lo:hi]),
                 resh(u_ub[lo:hi])))
            # (clen, n, ...) -> (L, ...) in time order
            unr = lambda a: jnp.swapaxes(a, 0, 1).reshape(
                (n * clen,) + a.shape[2:])
            x_out, cost, failed = carry
            return (unr(xs_s), unr(us_s), jnp.sum(cost), failed.any(),
                    x_out[-1])

        seg_main = jax.tree.map(
            lambda a: (a[: n_c * c] if hasattr(a, "ndim") and a.ndim
                       and a.shape[0] == L else a), seg)
        starts = [i + s * c for s in range(n_c)]
        xs_m, us_m, cost_m, failed_m, x_last = chunk_scan(
            seg_main, i, i + n_c * c, starts)
        if r == 0:
            return [xs_m], [us_m], cost_m, failed_m, x_last
        seg_rem = jax.tree.map(
            lambda a: (a[n_c * c:] if hasattr(a, "ndim") and a.ndim
                       and a.shape[0] == L else a), seg)
        lo = i + n_c * c
        xs_r, us_r, cost_r, failed_r, x_last = chunk_scan(
            seg_rem, lo, j, [lo])
        return ([xs_m, xs_r], [us_m, us_r], cost_m + cost_r,
                failed_m | failed_r, x_last)

    xs_parts, us_parts = [], []
    cost_try = jnp.zeros((), dt)
    failed = jnp.zeros((), bool)
    x_last = problem.x0.astype(dt)
    for seg, (i, j) in zip(problem.segments, problem._seg_slices()):
        xp, up, c_s, f_s, x_last = run_chunked(seg, i, j)
        xs_parts += xp
        us_parts += up
        cost_try = cost_try + c_s
        failed = failed | f_s
    xs_try = jnp.concatenate(xs_parts, axis=0)
    us_try = jnp.concatenate(us_parts, axis=0)

    xT_try = st.integrate(x_last, gap_scale * fs[-1])
    cost_try = cost_try + problem.terminal.calc_terminal(xT_try)
    failed = failed | _bad(cost_try)
    xs_try = jnp.concatenate([xs_try, xT_try[None]], axis=0)
    return xs_try, us_try, cost_try, failed


# ----------------------------------------------------------------------------
# Derivatives + gaps at the candidate — SolverDDP::calcDiff (ddp.cpp:157-178)
# ----------------------------------------------------------------------------

def _calc_diff(problem: ShootingProblem, xs, us, feasible):
    st = problem.state
    derivs, dterm, xnexts, costs = problem.calc_diff_full(xs, us)
    cost = jnp.sum(costs)
    f0 = st.diff(xs[0], problem.x0.astype(xs.dtype))
    frest = jax.vmap(st.diff)(xs[1:], xnexts)
    fs = jnp.concatenate([f0[None], frest], axis=0)
    fs = jnp.where(feasible, jnp.zeros_like(fs), fs)
    return derivs, dterm, fs, cost


# ----------------------------------------------------------------------------
# Main solve loop
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("settings",))
def solve(problem: ShootingProblem,
          xs_init: Optional[jax.Array] = None,
          us_init: Optional[jax.Array] = None,
          settings: SolverSettings = SolverSettings(),
          is_feasible: bool = False,
          reginit: Optional[float] = None,
          u_lb: Optional[jax.Array] = None,
          u_ub: Optional[jax.Array] = None) -> Solution:
    """Solve the shooting problem; mirrors SolverFDDP::solve (fddp.cpp:19-105)
    and SolverDDP::solve (ddp.cpp:41-118) when ``feasibility_driven=False``."""
    s = settings
    if s.ms_chunk > 0 and not s.feasibility_driven:
        # Chunk-boundary defects are only sound under the gap-tracked FDDP
        # machinery: plain DDP zeroes fs in the rollout and never measures
        # or contracts the boundary mismatches, so it could declare
        # convergence on a dynamically inconsistent trajectory.
        raise ValueError("ms_chunk > 0 requires feasibility_driven=True "
                         "(multiple-shooting defects are FDDP gaps)")
    T = problem.T
    st = problem.state
    nu = problem.nu

    x0 = problem.x0
    dt = x0.dtype
    if xs_init is None:
        xs_init = jnp.tile(x0[None], (T + 1, 1))
    if us_init is None:
        us_init = jnp.zeros((T, nu), dtype=dt)
    xs_init = xs_init.astype(dt)
    us_init = us_init.astype(dt)

    reg0 = jnp.asarray(s.regmin if reginit is None else reginit, dtype=dt)
    alphas = jnp.asarray(s.alphas, dtype=dt)
    ndx = st.ndx

    feas0 = jnp.asarray(is_feasible)
    # placeholder derivative/gap state — iteration 1 computes the real ones
    # (every iteration starts with an unconditional _calc_diff; a
    # data-dependent lax.cond here would run BOTH branches under vmap)
    derivs0, dterm0, fs0, cost0 = jax.eval_shape(
        lambda: _calc_diff(problem, xs_init, us_init, feas0))
    derivs0, dterm0, fs0, cost0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), (derivs0, dterm0, fs0, cost0))

    if s.record_trace:
        nanvec = jnp.full((s.maxiter,), jnp.nan, dtype=dt)
        trace0 = Trace(cost=nanvec, stop=nanvec, grad=nanvec, xreg=nanvec,
                       ureg=nanvec, steplength=nanvec,
                       feasible=jnp.zeros((s.maxiter,), bool))
    else:
        trace0 = None

    zK = jnp.zeros((T, nu, ndx), dtype=dt)
    zk = jnp.zeros((T, nu), dtype=dt)
    state0 = _IterState(
        xs=xs_init, us=us_init, feasible=feas0,
        was_feasible=jnp.zeros((), bool),
        xreg=reg0, ureg=reg0, cost=cost0,
        derivs=derivs0, dterm=dterm0, fs=fs0,
        Vx=jnp.zeros((T + 1, ndx), dtype=dt),
        Vxx=jnp.zeros((T + 1, ndx, ndx), dtype=dt),
        Qu=zk, k=zk, K=zK, Quuk=zk,
        dg=jnp.zeros((), dt), dq=jnp.zeros((), dt),
        d0=jnp.zeros((), dt), d1=jnp.zeros((), dt),
        stop=jnp.asarray(jnp.inf, dt),
        steplength=jnp.ones((), dt),
        iter=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool),
        diverged=jnp.zeros((), bool),
        trace=trace0,
    )

    regfactor = jnp.asarray(s.regfactor, dt)
    regmin = jnp.asarray(s.regmin, dt)
    regmax = jnp.asarray(s.regmax, dt)

    use_fscan = False
    if s.fused_scans:
        from ...ops import fused_node as _fnode
        from ...ops import fused_scans as _fscans
        use_fscan = _fscans.supports_problem(problem, s)
        _fs_interp = jax.default_backend() != "tpu"

    if s.box:
        if u_lb is None:
            u_lb = getattr(problem.segments[0], "u_lb", None)
            u_ub = getattr(problem.segments[0], "u_ub", None)
        if u_lb is None:
            raise ValueError("box solver requires control bounds (u_lb/u_ub)")
        u_lb = jnp.broadcast_to(jnp.asarray(u_lb, dt), (T, nu))
        u_ub = jnp.broadcast_to(jnp.asarray(u_ub, dt), (T, nu))
        qp_kw = dict(maxiter=s.qp_maxiter, th_acceptstep=s.qp_th_acceptstep,
                     th_grad=s.qp_th_grad, reg=s.qp_reg)

    def compute_direction(st_: _IterState) -> _IterState:
        # recalcDiff semantics (ddp.cpp:41-76): the reference refreshes
        # derivatives only after an accepted step.  Here every iteration
        # recomputes unconditionally: after a rejected line search the
        # candidate is unchanged, so recomputation yields identical
        # derivatives — same math, and strictly cheaper than a batched
        # lax.cond, which executes BOTH branches under vmap.  Failed
        # backward passes (reg escalation) still reuse them (inner loop).
        derivs, dterm, fs, cost = _calc_diff(problem, st_.xs, st_.us,
                                             st_.feasible)

        box_args = ((st_.us, u_lb, u_ub, st_.k, st_.feasible, qp_kw)
                    if s.box else None)

        def bp(xreg, ureg):
            if s.parallel_riccati and not s.box:
                from .parallel_riccati import backward_pass_parallel
                return backward_pass_parallel(derivs, dterm, fs, xreg, ureg)
            if use_fscan:
                from ...ops.fused_scans import riccati_backward_fused
                return riccati_backward_fused(derivs, dterm, fs, xreg,
                                              ureg, interpret=_fs_interp)
            return _backward_pass(derivs, dterm, fs, xreg, ureg, box_args,
                                  unroll=s.scan_unroll)

        # Regularization escalation (ddp.cpp:56-70): retry with reg ×10
        # until the factorization succeeds or regmax — the reference's
        # exception-driven ladder, restructured so the COMMON case (no
        # factorization failure — every warm-started MPC step) costs
        # exactly ONE full backward pass:
        #   1. run the full pass at the current reg; its failure flag is
        #      the same computation the reference's try/catch observes;
        #   2. if it failed, resolve the final (xreg, ureg) with a
        #      SCALAR-carry probe ladder (probe passes stack no outputs);
        #   3. re-run the full pass at the resolved reg — expressed as a
        #      run-at-most-once while_loop so that, under vmap, a batch
        #      with no failures pays ZERO masked-copy cost (a lax.cond
        #      would execute both branches under vmap; carrying the full
        #      direction tree through the ladder itself cost ~15x the
        #      backward pass at batch sizes — round-5 measurement, 85 ms
        #      vs 5.6 ms at B=64).
        # Decision-identical to the reference ladder: the same regs are
        # probed in the same order with the same failure predicate.

        def probe_failed(xreg, ureg):
            if s.parallel_riccati and not s.box:
                from .parallel_riccati import backward_pass_parallel
                return backward_pass_parallel(derivs, dterm, fs, xreg,
                                              ureg)[-1]
            if use_fscan:
                from ...ops.fused_scans import riccati_backward_fused
                return riccati_backward_fused(derivs, dterm, fs, xreg,
                                              ureg,
                                              interpret=_fs_interp)[-1]
            return _backward_pass(derivs, dterm, fs, xreg, ureg, box_args,
                                  probe=True, unroll=s.scan_unroll)

        res0 = bp(st_.xreg, st_.ureg)
        failed0 = res0[-1]
        pend0 = failed0 & (st_.xreg < regmax)
        xreg1 = jnp.where(pend0,
                          jnp.minimum(st_.xreg * regfactor, regmax),
                          st_.xreg)

        def retry_cond(c):
            return c[2]

        def retry_body(c):
            xreg, ureg, _ = c
            failed_n = probe_failed(xreg, ureg)
            can_retry = failed_n & (xreg < regmax)
            reg_new = jnp.where(can_retry,
                                jnp.minimum(xreg * regfactor, regmax), xreg)
            return (reg_new, reg_new, can_retry)

        xreg, ureg, _ = jax.lax.while_loop(
            retry_cond, retry_body, (xreg1, xreg1, pend0))

        def redo_cond(c):
            return c[1]

        def redo_body(c):
            return (bp(xreg, ureg), jnp.zeros((), bool))

        res, _ = jax.lax.while_loop(
            redo_cond, redo_body, (res0, xreg != st_.xreg))
        Vx, Vxx, Qu, kvec, K, Quuk, failed = res
        diverged = st_.diverged | failed  # still failing at regmax ⇒ abort
        return st_.replace(derivs=derivs, dterm=dterm, fs=fs, cost=cost,
                           Vx=Vx, Vxx=Vxx, Qu=Qu, k=kvec, K=K, Quuk=Quuk,
                           xreg=xreg, ureg=ureg, diverged=diverged)

    def update_expected_improvement(st_: _IterState) -> _IterState:
        # fddp.cpp:126-147 (FDDP) / ddp.cpp:144-155 (DDP)
        dg = jnp.sum(st_.Qu * st_.k)
        dq = -jnp.sum(st_.k * st_.Quuk)
        if s.feasibility_driven:
            dg = dg - jnp.sum(st_.Vx * st_.fs)
            dq = dq + jnp.sum(st_.fs * jnp.einsum("tij,tj->ti", st_.Vxx, st_.fs))
        return st_.replace(dg=dg, dq=dq)

    def line_search(st_: _IterState) -> _IterState:
        fs_fwd = st_.fs if s.feasibility_driven else jnp.zeros_like(st_.fs)

        bounds = (u_lb, u_ub) if s.box else (None, None)

        def trial(alpha):
            if use_fscan and s.ms_chunk == 0:
                from ...ops.fused_scans import trial_rollout_fused
                seg = problem.segments[0]
                xs_r, us_r, x_last, cost_try, failed = trial_rollout_fused(
                    seg, problem.x0.astype(st_.xs.dtype), st_.xs, st_.us,
                    st_.k, st_.K, fs_fwd, alpha, interpret=_fs_interp)
                xT_try = st.integrate(x_last, (alpha - 1.0) * fs_fwd[-1])
                cost_try = cost_try + problem.terminal.calc_terminal(xT_try)
                failed = failed | _bad(cost_try)
                xs_try = jnp.concatenate([xs_r, xT_try[None]], axis=0)
                us_try = us_r
            elif s.ms_chunk > 0:
                xs_try, us_try, cost_try, failed = _forward_pass_ms(
                    problem, st_.xs, st_.us, st_.k, st_.K, fs_fwd, alpha,
                    s.ms_chunk, *bounds)
            else:
                xs_try, us_try, cost_try, failed = _forward_pass(
                    problem, st_.xs, st_.us, st_.k, st_.K, fs_fwd, alpha,
                    *bounds, unroll=s.scan_unroll)
            dV = st_.cost - cost_try
            failed = failed | (cost_try >
                               s.th_blowup * (1.0 + jnp.abs(st_.cost)))
            if s.feasibility_driven:
                # fddp.cpp:107-124 expectedImprovement at the trial point
                dx = jax.vmap(st.diff)(xs_try, st_.xs)
                dv = -jnp.sum(st_.fs * jnp.einsum("tij,tj->ti", st_.Vxx, dx))
                d0 = st_.dg + dv
                d1 = st_.dq - 2.0 * dv
            else:
                d0, d1 = st_.dg, st_.dq
            dVexp = alpha * (d0 + 0.5 * alpha * d1)
            if s.feasibility_driven:
                pos = (dVexp >= 0) & ((d0 < s.th_grad) | (dV > s.th_acceptstep * dVexp))
                neg = (dVexp < 0) & (dV > s.th_acceptnegstep * dVexp)
                accept = pos | neg
            else:
                accept = (dVexp >= 0) & ((d0 < s.th_grad) | ~st_.feasible
                                         | (dV > s.th_acceptstep * dVexp))
            accept = accept & ~failed
            return xs_try, us_try, cost_try, accept, dV, dVexp, d0, d1

        if s.parallel_linesearch:
            xs_t, us_t, cost_t, acc, dV, dVexp, d0s, d1s = jax.vmap(trial)(alphas)
            any_acc = acc.any()
            idx = jnp.argmax(acc)  # first (largest) accepted α
            steplength = jnp.where(any_acc, alphas[idx], alphas[-1])
            pick = lambda arr: arr[idx]
        else:
            # sequential backtracking with early exit (ddp.cpp:78-94);
            # the loop body holds the ONLY instantiation of the trial
            # rollout (i starts at 0 with acc=False, so it runs >= once)
            def ls_cond(c):
                i, acc, _ = c
                return (i < s.n_alphas) & ~acc

            def ls_body(c):
                i, _, _ = c
                out = trial(alphas[i])
                return (i + 1, out[3], out)

            out0 = jax.tree.map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype),
                jax.eval_shape(lambda: trial(alphas[0])))
            i_fin, any_acc, out = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.zeros((), jnp.int32), jnp.zeros((), bool), out0))
            xs_t, us_t, cost_t, _, dV, dVexp, d0s, d1s = out
            steplength = alphas[jnp.minimum(i_fin - 1, s.n_alphas - 1)]
            pick = lambda arr: arr

        xs_new = jnp.where(any_acc, pick(xs_t), st_.xs)
        us_new = jnp.where(any_acc, pick(us_t), st_.us)
        cost_new = jnp.where(any_acc, pick(cost_t), st_.cost)
        if s.feasibility_driven:
            feas_new = st_.was_feasible | (steplength == 1.0)
            if s.ms_chunk > 0:
                # a multiple-shooting step always leaves chunk-boundary
                # defects: the candidate is never declared feasible (gaps
                # must keep being recomputed); convergence instead requires
                # the gap norm to contract below th_gaptol (see iteration())
                feas_new = jnp.zeros((), bool)
        else:
            feas_new = jnp.ones((), bool)
        was_feas = jnp.where(any_acc, st_.feasible, st_.was_feasible)
        feasible = jnp.where(any_acc, feas_new, st_.feasible)
        return st_.replace(
            xs=xs_new, us=us_new, cost=cost_new, feasible=feasible,
            was_feasible=was_feas,
            steplength=steplength, d0=pick(d0s), d1=pick(d1s))

    def adjust_regularization(st_: _IterState) -> _IterState:
        # ddp.cpp:95-104 + increase/decreaseRegularization (ddp.cpp:312-326)
        dec = st_.steplength > s.th_stepdec
        inc = st_.steplength <= s.th_stepinc
        xreg = st_.xreg
        xreg = jnp.where(dec, jnp.maximum(xreg / regfactor, regmin), xreg)
        xreg = jnp.where(inc, jnp.minimum(xreg * regfactor, regmax), xreg)
        diverged = st_.diverged | (inc & (xreg >= regmax))
        return st_.replace(xreg=xreg, ureg=xreg, diverged=diverged)

    def record(st_: _IterState) -> _IterState:
        if not s.record_trace:
            return st_
        i = st_.iter
        tr = st_.trace
        tr = Trace(
            cost=tr.cost.at[i].set(st_.cost),
            stop=tr.stop.at[i].set(st_.stop),
            grad=tr.grad.at[i].set(-st_.d1),
            xreg=tr.xreg.at[i].set(st_.xreg),
            ureg=tr.ureg.at[i].set(st_.ureg),
            steplength=tr.steplength.at[i].set(st_.steplength),
            feasible=tr.feasible.at[i].set(st_.feasible),
        )
        return st_.replace(trace=tr)

    def iteration(st_: _IterState) -> _IterState:
        st_ = compute_direction(st_)
        st_ = update_expected_improvement(st_)
        st_ = line_search(st_)
        st_ = adjust_regularization(st_)
        stop = jnp.sum(st_.Qu ** 2)  # ddp.cpp:132-142
        st_ = st_.replace(stop=stop)
        st_ = record(st_)
        if s.iter_callback is not None:
            jax.debug.callback(s.iter_callback, st_.iter, st_.cost, st_.xs)
        if s.ms_chunk > 0 and s.feasibility_driven:
            converged = ((stop < s.th_stop)
                         & (jnp.max(jnp.abs(st_.fs)) < s.th_gaptol))
        else:
            converged = st_.was_feasible & (stop < s.th_stop)
        return st_.replace(converged=converged, iter=st_.iter + 1)

    def cond(st_):
        return (st_.iter < s.maxiter) & ~st_.converged & ~st_.diverged

    if s.maxiter == 1:
        # the MPC-replan configuration: the loop guard is always true at
        # entry (iter=0, not converged/diverged), so the while_loop would
        # run its body exactly once — calling it directly removes the
        # loop's carry double-buffering (the carry holds the full derivs/
        # V/K state, ~GBs at benchmark batch sizes: measured 626 -> 1438
        # solves/s at B=512).
        final = iteration(state0)
    else:
        # Multi-iteration solves get the same treatment by shrinking the
        # while CARRY to the candidate + scalars (+ the small k/K, the
        # BoxQP warm start and feedback): derivs/gaps/value surfaces are
        # recomputed every iteration anyway, so carrying them only paid
        # the loop's double-buffer copies.  The Solution's direction
        # fields are recomputed once at the final candidate after the
        # loop (they then correspond to the RETURNED trajectory — the
        # reference exposes the direction of the last pre-step candidate
        # instead, solver-base getters).
        SMALL = ("xs", "us", "feasible", "was_feasible", "xreg", "ureg",
                 "cost", "k", "K", "d0", "d1", "stop", "steplength",
                 "iter", "converged", "diverged", "trace")

        def deflate(st_):
            return {f: getattr(st_, f) for f in SMALL}

        def inflate(c):
            # big fields come from the loop-invariant zero placeholders in
            # state0 (hoisted constants, not part of the carry); every
            # consumer overwrites them before reading
            return state0.replace(**c)

        def cond_small(c):
            return ((c["iter"] < s.maxiter) & ~c["converged"]
                    & ~c["diverged"])

        def iteration_small(c):
            return deflate(iteration(inflate(c)))

        final_c = jax.lax.while_loop(cond_small, iteration_small,
                                     deflate(state0))
        final = compute_direction(inflate(final_c))
        # The recompute exists ONLY to expose the direction fields
        # (Vx/Vxx/Qu/k/K/fs) at the returned trajectory; its reg-escalation
        # ladder must not overwrite the loop's reported xreg/ureg or flip
        # diverged on a solve that converged inside the loop.
        final = final.replace(xreg=final_c["xreg"], ureg=final_c["ureg"],
                              diverged=final_c["diverged"])
        # NOTE on the maxiter==1 fast path above: there the direction fields
        # correspond to the PRE-step candidate (reference getter semantics);
        # here they correspond to the returned trajectory.

    return Solution(
        xs=final.xs, us=final.us, K=final.K, k=final.k,
        Vx=final.Vx, Vxx=final.Vxx, Qu=final.Qu, fs=final.fs,
        cost=final.cost, stop=final.stop, xreg=final.xreg, ureg=final.ureg,
        steplength=final.steplength, d0=final.d0, d1=final.d1,
        iter=final.iter, is_feasible=final.feasible,
        converged=final.converged, diverged=final.diverged,
        trace=final.trace,
    )


def polish(problem: ShootingProblem, solution: Solution, iters: int = 2,
           dtype=jnp.float64, settings: Optional[SolverSettings] = None
           ) -> Solution:
    """Mixed-precision refinement: warm-start a few float64 iterations from
    a float32 solution.

    The f32 (TPU-throughput) solve converges to its gradient floor
    (stop ≈ 1e-5-scale on robot problems), which leaves ~1e-4-relative
    control deviation vs a full f64 solve; two f64 polish iterations drive
    that below 1e-5 — the precision policy used to meet the north star's
    <1e-4 control-deviation budget (see PARITY.md)."""
    from ...utils.casting import cast_floats
    p = cast_floats(problem, dtype)
    s = settings if settings is not None else SolverSettings(
        th_stop=1e-9, record_trace=False)
    s = s.replace(maxiter=iters)
    return solve(p, xs_init=solution.xs.astype(dtype),
                 us_init=solution.us.astype(dtype), settings=s)


def ddp_settings(**kw) -> SolverSettings:
    return SolverSettings(feasibility_driven=False, **kw)


def fddp_settings(**kw) -> SolverSettings:
    return SolverSettings(feasibility_driven=True, **kw)


def box_ddp_settings(**kw) -> SolverSettings:
    kw.setdefault("th_stop", 5e-5)  # box-ddp.cpp:28
    return SolverSettings(feasibility_driven=False, box=True, **kw)


def box_fddp_settings(**kw) -> SolverSettings:
    kw.setdefault("th_stop", 5e-5)  # box-fddp.cpp:28
    return SolverSettings(feasibility_driven=True, box=True, **kw)
