"""Whole-scan Pallas kernels: Riccati backward pass + trial rollout.

The b=1 MPC replan latency is dominated by the two SEQUENTIAL stages: the
Riccati recursion and the trial rollout execute T (=108) dependent
iterations of ~µs-scale math, each paying XLA while-loop bookkeeping and
kernel-launch overhead (BENCH_DETAIL r4: 76 ms best-lane replan vs ~4 ms of
device-busy content; reference context: the ~1 kHz MPC budget,
BASELINE.md §3).  These kernels move the ENTIRE T-loop inside one Pallas
kernel: the loop state lives in VMEM/registers, per-step operands are read
from VMEM refs at a dynamic leading index, and the per-step math is the
same jaxpr as the reference-semantics XLA implementation (hoisted once and
replayed inside the kernel), so the numerical behavior is identical to
core/solvers/fddp.py's `_backward_pass` (ddp.cpp:180-253 port) and
`_forward_pass` (fddp.cpp:149-225 port) by construction.

Scope: non-box solves, single-segment problems whose node structure the
fused node kernel supports (ops/fused_node.supports) — the gait/MPC
configurations.  Enabled with SolverSettings(fused_scans=True).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from . import smallchol as _sc
from . import fused_node as fnode
from .fused_node import (TL, _lane_state_diff, lane_calc_primal,
                         lane_integrate, lmv)


def _hoist(fun_flat, example_flat):
    """Trace ``fun_flat(*flat) -> list`` once; return (body, consts) where
    ``body(*consts, *flat)`` replays the jaxpr — Pallas kernels may not
    capture array constants, so they are fed as explicit operands."""
    from jax._src import core as _score
    from jax._src.interpreters import partial_eval as _pe
    closed = jax.make_jaxpr(fun_flat)(*example_flat)
    consts = [jnp.asarray(c) for c in closed.consts]
    body = _score.jaxpr_as_fun(
        _score.ClosedJaxpr(_pe.convert_constvars_jaxpr(closed.jaxpr), ()))
    return body, consts


def _pl():
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
    except ImportError:  # pragma: no cover
        pltpu = None
    return pl, pltpu


# ---------------------------------------------------------------------------
# Riccati backward pass (ddp.cpp:180-253 semantics, _backward_pass port)
# ---------------------------------------------------------------------------

def riccati_backward_fused(derivs, dterm, fs, xreg, ureg,
                           interpret: bool = False):
    """Drop-in for fddp._backward_pass (non-box): returns
    (Vx, Vxx, Qu, k, K, Quuk, failed) with the whole reversed-time
    recursion inside ONE Pallas kernel.

    All in-kernel quantities are kept RANK-2 (column vectors (n, 1)):
    rank-raising reshapes of 1-D values relayout lanes into sublanes,
    which Mosaic cannot compile (observed as layout.h check failures)."""
    pl, pltpu = _pl()
    dt = fs.dtype
    T, ndx = fs.shape[0] - 1, fs.shape[1]
    nu = derivs.Lu.shape[1]
    eye = jnp.eye(ndx, dtype=dt)

    def cho_solve_2d(L, B):
        """2-D-only Cholesky solve: L (n,n) lower, B (n,m); every access is
        a (1,1)/(1,m) slice so no 1-D values exist."""
        n = L.shape[0]
        rows = []
        for i in range(n):
            r = B[i:i + 1, :]
            for k in range(i):
                r = r - L[i:i + 1, k:k + 1] * rows[k]
            rows.append(r / L[i:i + 1, i:i + 1])
        out = [None] * n
        for i in reversed(range(n)):
            r = rows[i]
            for k in range(i + 1, n):
                r = r - L[k:k + 1, i:i + 1] * out[k]
            out[i] = r / L[i:i + 1, i:i + 1]
        return jnp.concatenate(out, axis=0)

    def chol_2d(A):
        """2-D-only lower Cholesky (n,n), column Crout with (n,1) columns
        (smallchol.chol math, no 1-D values)."""
        n = A.shape[0]
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        cols = []                                       # columns of L (n,1)
        for j in range(n):
            sj = A[:, j:j + 1]
            for k in range(j):
                sj = sj - cols[k] * cols[k][j:j + 1, :]
            d = jnp.sqrt(sj[j:j + 1, :])                # (1, 1)
            col = jnp.where(rowi == j, d, sj / d)
            col = col * (rowi >= j).astype(A.dtype)
            cols.append(col)
        return jnp.concatenate(cols, axis=1)

    def step_fun(Vx_n, Vxx_n, failed, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, f,
                 xreg_s, ureg_s):
        # identical math to fddp._backward_pass.step (non-box branch);
        # Vx_n/Lx/Lu/Qu/k are COLUMN vectors (n, 1)
        FxT_Vxx = Fx.T @ Vxx_n
        Qxx = Lxx + FxT_Vxx @ Fx
        Qx = Lx + Fx.T @ Vx_n
        Qxu = Lxu + FxT_Vxx @ Fu
        Quu = Luu + Fu.T @ Vxx_n @ Fu
        Quu = Quu + ureg_s * jnp.eye(nu, dtype=dt)
        Qu = Lu + Fu.T @ Vx_n
        diag_q = (Quu * jnp.eye(nu, dtype=dt)).sum(-1, keepdims=True)
        dscale = jnp.sqrt(jnp.maximum(diag_q, 1e-30))   # (nu, 1)
        Quu_eq = Quu / dscale / dscale.T
        chol = chol_2d(Quu_eq)
        failed = failed | jnp.isnan(chol).any()

        def chol_solve(B):
            return cho_solve_2d(chol, B / dscale) / dscale

        K = chol_solve(Qxu.T)                           # (nu, ndx)
        kvec = chol_solve(Qu)                           # (nu, 1)
        Quuk = Quu @ kvec
        Vx = Qx + K.T @ Quuk - 2.0 * (K.T @ Qu)
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
        Vxx = Vxx + xreg_s * eye
        Vx = Vx + Vxx @ f
        failed = failed | ~(jnp.max(jnp.abs(Vx)) < 1e30) \
            | ~(jnp.max(jnp.abs(Vxx)) < 1e30)
        return [Vx, Vxx, failed, Qu, kvec, K, Quuk]

    d_leaves = [derivs.Fx, derivs.Fu, derivs.Lx[..., None],
                derivs.Lu[..., None], derivs.Lxx, derivs.Lxu, derivs.Luu]
    step_ex = ([jnp.zeros((ndx, 1), dt), jnp.zeros((ndx, ndx), dt),
                jnp.zeros((), bool)]
               + [jnp.zeros(l.shape[1:], dt) for l in d_leaves]
               + [jnp.zeros((ndx, 1), dt), jnp.zeros((), dt),
                  jnp.zeros((), dt)])
    step_body, step_consts = _hoist(step_fun, step_ex)

    def term_fun(Lx_T, Lxx_T, f_T, xreg_s):
        Vxx_T = Lxx_T + xreg_s * eye
        Vx_T = Lx_T + Vxx_T @ f_T
        failed0 = ~(jnp.max(jnp.abs(Vx_T)) < 1e30) \
            | ~(jnp.max(jnp.abs(Vxx_T)) < 1e30)
        return [Vx_T, Vxx_T, failed0]

    term_ex = [jnp.zeros((ndx, 1), dt), jnp.zeros((ndx, ndx), dt),
               jnp.zeros((ndx, 1), dt), jnp.zeros((), dt)]
    term_body, term_consts = _hoist(term_fun, term_ex)

    ins = d_leaves + [dterm.Lx[..., None], dterm.Lxx, fs[..., None],
                      jnp.reshape(xreg, (1, 1)), jnp.reshape(ureg, (1, 1))]
    n_in = len(ins)
    n_sc = len(step_consts)
    n_tc = len(term_consts)

    def kernel(*refs):
        in_refs = refs[:n_in]
        sc_refs = refs[n_in:n_in + n_sc]
        tc_refs = refs[n_in + n_sc:n_in + n_sc + n_tc]
        (Vx_ref, Vxx_ref, Qu_ref, k_ref, K_ref, Quuk_ref,
         failed_ref) = refs[n_in + n_sc + n_tc:]
        d_refs = in_refs[:7]
        Lx_T_ref, Lxx_T_ref, fs_ref = in_refs[7], in_refs[8], in_refs[9]
        xreg_s = in_refs[10][0, 0]
        ureg_s = in_refs[11][0, 0]
        scs = [r[...] for r in sc_refs]
        tcs = [r[...] for r in tc_refs]

        Vx_T, Vxx_T, failed0 = term_body(
            *tcs, Lx_T_ref[...], Lxx_T_ref[...], fs_ref[T], xreg_s)
        Vx_ref[T] = Vx_T
        Vxx_ref[T] = Vxx_T

        def body(t, carry):
            Vx_n, Vxx_n, failed = carry
            td = T - 1 - t
            outs = step_body(
                *scs, Vx_n, Vxx_n, failed,
                d_refs[0][td], d_refs[1][td], d_refs[2][td], d_refs[3][td],
                d_refs[4][td], d_refs[5][td], d_refs[6][td],
                fs_ref[td], xreg_s, ureg_s)
            Vx, Vxx, failed, Qu, kvec, K, Quuk = outs
            Vx_ref[td] = Vx
            Vxx_ref[td] = Vxx
            Qu_ref[td] = Qu
            k_ref[td] = kvec
            K_ref[td] = K
            Quuk_ref[td] = Quuk
            return (Vx, Vxx, failed)

        _, _, failed = jax.lax.fori_loop(0, T, body, (Vx_T, Vxx_T, failed0))
        failed_ref[...] = failed[None, None]

    out_shapes = [
        jax.ShapeDtypeStruct((T + 1, ndx, 1), dt),     # Vx
        jax.ShapeDtypeStruct((T + 1, ndx, ndx), dt),   # Vxx
        jax.ShapeDtypeStruct((T, nu, 1), dt),          # Qu
        jax.ShapeDtypeStruct((T, nu, 1), dt),          # k
        jax.ShapeDtypeStruct((T, nu, ndx), dt),        # K
        jax.ShapeDtypeStruct((T, nu, 1), dt),          # Quuk
        jax.ShapeDtypeStruct((1, 1), bool),            # failed
    ]
    kw = {}
    if pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    Vx, Vxx, Qu, kvec, K, Quuk, failed = pl.pallas_call(
        kernel, out_shape=out_shapes, interpret=interpret, **kw,
    )(*ins, *step_consts, *term_consts)
    return (Vx[..., 0], Vxx, Qu[..., 0], kvec[..., 0], K, Quuk[..., 0],
            failed[0, 0])


# ---------------------------------------------------------------------------
# Trial rollout (fddp.cpp:149-225 semantics, _forward_pass port) — single
# segment, no control bounds
# ---------------------------------------------------------------------------

def trial_rollout_fused(seg, x0, xs, us, k, K, fs, alpha,
                        interpret: bool = False):
    """One FDDP trial rollout with the whole sequential T-loop inside one
    Pallas kernel.  Returns (xs_try (T, nx) WITHOUT the terminal state,
    us_try (T, nu), x_last (nx,), cost_running, failed) — the caller adds
    the terminal node (integrate + calc_terminal), a single cheap
    evaluation outside the kernel.

    Every per-step operand is fed with a TRAILING singleton axis (the
    N=1 lane axis of the fused-node lane code) so that the dynamically
    indexed time axis is an UNTILED leading dimension — Mosaic only
    allows dynamic indexing there."""
    pl, pltpu = _pl()
    st = seg.state_
    nq, nv = st.nq, st.nv
    nx, ndx = st.nx, st.ndx
    nu = seg.actuation.nu
    dt = xs.dtype
    T = us.shape[0]
    from ..dynamics.model import JointType
    has_ff = JointType(st.model.joint_types[0]) == JointType.FREE_FLYER

    seg_leaves, seg_def = jax.tree.flatten(seg)
    seg_scalar = [l.ndim == 1 for l in seg_leaves]   # (T,) per-node scalars

    def step_fun(xnext, cost, failed, x_ref, u_ref, k_t, K_t, f_t, alpha_s,
                 *seg_t):
        # lane layout with N=1 trailing axis; identical math to
        # fddp._forward_pass.step
        seg_t_tree = jax.tree.unflatten(seg_def, list(seg_t))
        gap_scale = alpha_s - 1.0
        x_try = lane_integrate(has_ff, nq, nv, xnext, gap_scale * f_t)
        dx, _ = _lane_state_diff(has_ff, nq, nv, x_ref, x_try)
        u_try = u_ref - alpha_s * k_t - lmv(K_t, dx)
        xnext_new, c = lane_calc_primal(seg_t_tree, x_try, u_try)
        cost_new = cost + c[0]
        bad = ~((jnp.abs(cost_new) < 1e30)
                & (jnp.max(jnp.abs(xnext_new)) < 1e30))
        return [xnext_new, cost_new, failed | bad, x_try, u_try]

    seg_t_ex = [jnp.zeros(l.shape[1:] + (1,), l.dtype) for l in seg_leaves]
    step_ex = ([jnp.zeros((nx, 1), dt), jnp.zeros((), dt),
                jnp.zeros((), bool), jnp.zeros((nx, 1), dt),
                jnp.zeros((nu, 1), dt), jnp.zeros((nu, 1), dt),
                jnp.zeros((nu, ndx, 1), dt), jnp.zeros((ndx, 1), dt),
                jnp.zeros((), dt)] + seg_t_ex)
    step_body, step_consts = _hoist(step_fun, step_ex)

    def lift(a):
        """Append the lane axis; (T,) scalars become (T, 1, 1) so the time
        axis stays untiled."""
        return a[:, None, None] if a.ndim == 1 else a[..., None]

    ins = ([lift(l) for l in seg_leaves]
           + [x0[:, None], xs[..., None], us[..., None], k[..., None],
              K[..., None], fs[..., None], jnp.reshape(alpha, (1, 1))])
    n_seg = len(seg_leaves)
    n_in = len(ins)
    n_sc = len(step_consts)

    def kernel(*refs):
        in_refs = refs[:n_in]
        sc_refs = refs[n_in:n_in + n_sc]
        xs_try_ref, us_try_ref, xlast_ref, cost_ref, failed_ref = \
            refs[n_in + n_sc:]
        seg_refs = in_refs[:n_seg]
        x0_ref, xs_ref, us_ref, k_ref, K_ref, fs_ref, alpha_ref = \
            in_refs[n_seg:]
        alpha_s = alpha_ref[0, 0]
        scs = [r[...] for r in sc_refs]

        def body(t, carry):
            xnext, cost, failed = carry
            seg_t = [r[t, 0] if sc else r[t]
                     for r, sc in zip(seg_refs, seg_scalar)]
            outs = step_body(
                *scs, xnext, cost, failed, xs_ref[t], us_ref[t], k_ref[t],
                K_ref[t], fs_ref[t], alpha_s, *seg_t)
            xnext_new, cost_new, failed, x_try, u_try = outs
            xs_try_ref[t] = x_try
            us_try_ref[t] = u_try
            return (xnext_new, cost_new, failed)

        carry0 = (x0_ref[...], jnp.zeros((), dt), jnp.zeros((), bool))
        x_last, cost, failed = jax.lax.fori_loop(0, T, body, carry0)
        xlast_ref[...] = x_last
        cost_ref[...] = cost[None, None]
        failed_ref[...] = failed[None, None]

    out_shapes = [
        jax.ShapeDtypeStruct((T, nx, 1), dt),
        jax.ShapeDtypeStruct((T, nu, 1), dt),
        jax.ShapeDtypeStruct((nx, 1), dt),
        jax.ShapeDtypeStruct((1, 1), dt),
        jax.ShapeDtypeStruct((1, 1), bool),
    ]
    kw = {}
    if pltpu is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    xs_try, us_try, x_last, cost, failed = pl.pallas_call(
        kernel, out_shape=out_shapes, interpret=interpret, **kw,
    )(*ins, *step_consts)
    return (xs_try[..., 0], us_try[..., 0], x_last[:, 0], cost[0, 0],
            failed[0, 0])


def supports_problem(problem, settings) -> bool:
    """Trace-time gate for the fused scans: non-box, single segment, node
    structure covered by the fused node kernel."""
    if settings.box:
        return False
    segs = problem.segments
    return len(segs) == 1 and fnode.supports(segs[0])
