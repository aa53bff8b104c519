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

import jax
import jax.numpy as jnp

from . import fused_node as fnode
from .fused_node import (_lane_state_diff, lane_calc_primal,
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


# ---------------------------------------------------------------------------
# Batch-native lane kernels: problems ride the LANE axis, the T-loop is the
# Pallas GRID (sequential on TPU) with the recursion carry in SCRATCH.
# These are the throughput versions of the kernels above (which put the
# T-loop in a fori inside one grid step and serve the b=1 latency lane).
# ---------------------------------------------------------------------------

def riccati_backward_lanes(derivs_l, dterm_l, fs_l, xreg, ureg,
                           interpret: bool = False):
    """Batch-native Riccati backward pass.

    Lane layout: every operand carries a TRAILING problem axis B —
    derivs_l leaves (T, ..., B), dterm_l leaves (..., B), fs_l
    (T+1, ndx, B), xreg/ureg (B,).  Grid = (T,) stepping reversed time;
    per-step derivative blocks stream HBM→VMEM through the Pallas
    pipeline; (Vx, Vxx, failed) carry lives in VMEM scratch.  Same math
    as fddp._backward_pass (ddp.cpp:180-253 + Jacobi equilibration).

    Returns (Vx (T+1,ndx,B), Vxx (T+1,ndx,ndx,B), Qu (T,nu,B),
    k (T,nu,B), K (T,nu,ndx,B), Quuk (T,nu,B), failed (B,))."""
    pl, pltpu = _pl()
    from .fused_node import lT, lchol, lcho_solve, leye, lmm_chunk, lmv
    import jax.numpy as jnp

    Fx, Fu, Lx, Lu, Lxx, Lxu, Luu = (derivs_l.Fx, derivs_l.Fu, derivs_l.Lx,
                                     derivs_l.Lu, derivs_l.Lxx,
                                     derivs_l.Lxu, derivs_l.Luu)
    T, ndx = Fx.shape[0], Fx.shape[1]
    nu = Lu.shape[1]
    B = Fx.shape[-1]
    dt = Fx.dtype

    def step_fun(Vx_n, Vxx_n, failedf, Fx_t, Fu_t, Lx_t, Lu_t, Lxx_t,
                 Lxu_t, Luu_t, f_t, xreg_l, ureg_l):
        # lane port of fddp._backward_pass.step; failedf is a (1, B) float
        FxT = lT(Fx_t)
        FxT_Vxx = lmm_chunk(FxT, Vxx_n, chunk=6)
        Qxx = Lxx_t + lmm_chunk(FxT_Vxx, Fx_t, chunk=6)
        Qx = Lx_t + lmv(FxT, Vx_n)
        Qxu = Lxu_t + lmm_chunk(FxT_Vxx, Fu_t, chunk=6)
        FuT = lT(Fu_t)
        Quu = Luu_t + lmm_chunk(lmm_chunk(FuT, Vxx_n, chunk=6), Fu_t,
                                chunk=6)
        Quu = Quu + ureg_l[None, None] * leye(nu, Quu[0])
        Qu = Lu_t + lmv(FuT, Vx_n)
        diag_q = (Quu * leye(nu, Quu[0])).sum(1)          # (nu, B)
        dscale = jnp.sqrt(jnp.maximum(diag_q, 1e-30))
        Quu_eq = Quu / dscale[:, None] / dscale[None, :]
        chol = lchol(Quu_eq)
        bad_ch = jnp.isnan(chol).any(axis=(0, 1))         # (B,)

        def chol_solve_mat(Bm):
            y = lcho_solve(chol, Bm / dscale[:, None])
            return y / dscale[:, None]

        K = chol_solve_mat(lT(Qxu))                       # (nu, ndx, B)
        kvec = chol_solve_mat(Qu[:, None])[:, 0]          # (nu, B)
        Quuk = lmv(Quu, kvec)
        KT = lT(K)
        Vx = Qx + lmv(KT, Quuk) - 2.0 * lmv(KT, Qu)
        Vxx = Qxx - lmm_chunk(Qxu, K, chunk=6)
        Vxx = 0.5 * (Vxx + lT(Vxx))
        Vxx = Vxx + xreg_l[None, None] * leye(ndx, Vxx[0])
        Vx = Vx + lmv(Vxx, f_t)
        bad = (bad_ch | ~(jnp.max(jnp.abs(Vx), axis=0) < 1e30)
               | ~(jnp.max(jnp.abs(Vxx), axis=(0, 1)) < 1e30))
        failed = jnp.maximum(failedf, bad.astype(dt)[None])
        return [Vx, Vxx, failed, Qu, kvec, K, Quuk]

    step_ex = [jnp.zeros((ndx, B), dt), jnp.zeros((ndx, ndx, B), dt),
               jnp.zeros((1, B), dt),
               jnp.zeros((ndx, ndx, B), dt), jnp.zeros((ndx, nu, B), dt),
               jnp.zeros((ndx, B), dt), jnp.zeros((nu, B), dt),
               jnp.zeros((ndx, ndx, B), dt), jnp.zeros((ndx, nu, B), dt),
               jnp.zeros((nu, nu, B), dt), jnp.zeros((ndx, B), dt),
               jnp.zeros((B,), dt), jnp.zeros((B,), dt)]
    step_body, step_consts = _hoist(step_fun, step_ex)

    def term_fun(Lx_T, Lxx_T, f_T, xreg_l):
        Vxx_T = Lxx_T + xreg_l[None, None] * leye(ndx, Lxx_T[0])
        Vx_T = Lx_T + lmv(Vxx_T, f_T)
        bad = (~(jnp.max(jnp.abs(Vx_T), axis=0) < 1e30)
               | ~(jnp.max(jnp.abs(Vxx_T), axis=(0, 1)) < 1e30))
        return [Vx_T, Vxx_T, bad.astype(dt)[None]]

    term_ex = [jnp.zeros((ndx, B), dt), jnp.zeros((ndx, ndx, B), dt),
               jnp.zeros((ndx, B), dt), jnp.zeros((B,), dt)]
    term_body, term_consts = _hoist(term_fun, term_ex)

    if interpret:
        # pure-XLA lane fallback (CPU tests / non-TPU backends): the same
        # step function under lax.scan — the Pallas grid path is exercised
        # on TPU (bench + manual validation); interpret-mode execution of
        # a 108-step grid kernel is minutes-slow on this host
        Vx_T, Vxx_T, f0 = term_fun(dterm_l.Lx, dterm_l.Lxx, fs_l[-1], xreg)

        def scan_step(carry, inp):
            Vx_n, Vxx_n, failedf = carry
            Fx_t, Fu_t, Lx_t, Lu_t, Lxx_t, Lxu_t, Luu_t, f_t = inp
            outs = step_fun(Vx_n, Vxx_n, failedf, Fx_t, Fu_t, Lx_t, Lu_t,
                            Lxx_t, Lxu_t, Luu_t, f_t, xreg, ureg)
            Vx, Vxx, failed, Qu, kvec, K, Quuk = outs
            return (Vx, Vxx, failed), (Vx, Vxx, Qu, kvec, K, Quuk)

        (_, _, failed), outs = jax.lax.scan(
            scan_step, (Vx_T, Vxx_T, f0),
            (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_l[:-1]), reverse=True)
        Vx_r, Vxx_r, Qu, kvec, K, Quuk = outs
        Vx = jnp.concatenate([Vx_r, Vx_T[None]], axis=0)
        Vxx = jnp.concatenate([Vxx_r, Vxx_T[None]], axis=0)
        return Vx, Vxx, Qu, kvec, K, Quuk, failed[0] > 0.5

    # per-step streamed inputs (blocks step reversed time)
    step_ins = [Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_l[:-1]]
    # whole-array inputs
    whole_ins = [dterm_l.Lx, dterm_l.Lxx, fs_l[-1],
                 jnp.reshape(xreg, (1, B)), jnp.reshape(ureg, (1, B))]

    n_step = len(step_ins)
    n_whole = len(whole_ins)
    n_sc, n_tc = len(step_consts), len(term_consts)

    def blk_spec(a):
        shp = (1,) + a.shape[1:]
        nrest = a.ndim - 1
        return pl.BlockSpec(shp, lambda t, _n=nrest: (T - 1 - t,) + (0,) * _n)

    def whole_spec(a):
        return pl.BlockSpec(a.shape, lambda t, _n=a.ndim: (0,) * _n)

    def kernel(*refs):
        i = 0
        s_refs = refs[i:i + n_step]; i += n_step
        w_refs = refs[i:i + n_whole]; i += n_whole
        sc_refs = refs[i:i + n_sc]; i += n_sc
        tc_refs = refs[i:i + n_tc]; i += n_tc
        (Vx_o, Vxx_o, Qu_o, k_o, K_o, Quuk_o, VxT_o, VxxT_o,
         failed_o) = refs[i:i + 9]
        vx_s, vxx_s, fail_s = refs[i + 9:]
        t = pl.program_id(0)
        scs = [r[...] for r in sc_refs]
        tcs = [r[...] for r in tc_refs]
        xreg_l = w_refs[3][...][0]
        ureg_l = w_refs[4][...][0]

        @pl.when(t == 0)
        def _():
            Vx_T, Vxx_T, f0 = term_body(
                *tcs, w_refs[0][...], w_refs[1][...], w_refs[2][...],
                xreg_l)
            vx_s[...] = Vx_T
            vxx_s[...] = Vxx_T
            fail_s[...] = f0
            VxT_o[...] = Vx_T
            VxxT_o[...] = Vxx_T

        outs = step_body(
            *scs, vx_s[...], vxx_s[...], fail_s[...],
            s_refs[0][0], s_refs[1][0], s_refs[2][0], s_refs[3][0],
            s_refs[4][0], s_refs[5][0], s_refs[6][0], s_refs[7][0],
            xreg_l, ureg_l)
        Vx, Vxx, failed, Qu, kvec, K, Quuk = outs
        vx_s[...] = Vx
        vxx_s[...] = Vxx
        fail_s[...] = failed
        Vx_o[...] = Vx[None]
        Vxx_o[...] = Vxx[None]
        Qu_o[...] = Qu[None]
        k_o[...] = kvec[None]
        K_o[...] = K[None]
        Quuk_o[...] = Quuk[None]
        failed_o[...] = failed

    out_shapes = [
        jax.ShapeDtypeStruct((T, ndx, B), dt),          # Vx rows 0..T-1
        jax.ShapeDtypeStruct((T, ndx, ndx, B), dt),     # Vxx rows
        jax.ShapeDtypeStruct((T, nu, B), dt),           # Qu
        jax.ShapeDtypeStruct((T, nu, B), dt),           # k
        jax.ShapeDtypeStruct((T, nu, ndx, B), dt),      # K
        jax.ShapeDtypeStruct((T, nu, B), dt),           # Quuk
        jax.ShapeDtypeStruct((ndx, B), dt),             # Vx[T]
        jax.ShapeDtypeStruct((ndx, ndx, B), dt),        # Vxx[T]
        jax.ShapeDtypeStruct((1, B), dt),               # failed (float)
    ]
    out_specs = ([blk_spec(jax.ShapeDtypeStruct((T,) + s.shape[1:], dt))
                  for s in out_shapes[:6]]
                 + [whole_spec(s) for s in out_shapes[6:]])
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    scratch = [pltpu.VMEM((ndx, B), dt), pltpu.VMEM((ndx, ndx, B), dt),
               pltpu.VMEM((1, B), dt)]
    (Vx_r, Vxx_r, Qu, kvec, K, Quuk, Vx_T, Vxx_T, failed) = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=([blk_spec(a) for a in step_ins]
                  + [whole_spec(a) for a in whole_ins]
                  + [whole_spec(c) for c in step_consts]
                  + [whole_spec(c) for c in term_consts]),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(*step_ins, *whole_ins, *step_consts, *term_consts)
    Vx = jnp.concatenate([Vx_r, Vx_T[None]], axis=0)
    Vxx = jnp.concatenate([Vxx_r, Vxx_T[None]], axis=0)
    return Vx, Vxx, Qu, kvec, K, Quuk, failed[0] > 0.5


def trial_rollout_lanes(seg, x0_l, xs_l, us_l, k_l, K_l, fs_l, fsT_l,
                        alpha, interpret: bool = False):
    """Batch-native FDDP trial rollout: problems on the lane axis, grid
    over T with the rollout state in scratch.

    Lane layout: x0_l (nx, B); xs_l/us_l/k_l/K_l/fs_l (T, ..., B) are the
    candidate rows 0..T-1 (fsT_l (ndx, B) is fs[T], returned to the caller
    untouched — kept in the signature so call sites keep the full-fs
    contract explicit); alpha is a SCALAR step length shared by the batch
    (the batch-native line search iterates the alpha ladder globally with
    per-problem acceptance masks, decision-equivalent to the vmapped
    per-problem early-exit loop).  Node parameters enter with a trailing
    singleton lane axis and are broadcast to B inside the step.

    Returns (xs_try (T, nx, B), us_try (T, nu, B), x_last (nx, B),
    cost (B,), failed (B,) bool)."""
    pl, pltpu = _pl()
    st = seg.state_
    nq, nv = st.nq, st.nv
    nx, ndx = st.nx, st.ndx
    nu = seg.actuation.nu
    dt = xs_l.dtype
    T = us_l.shape[0]
    B = x0_l.shape[-1]
    from ..dynamics.model import JointType
    has_ff = JointType(st.model.joint_types[0]) == JointType.FREE_FLYER

    seg_leaves, seg_def = jax.tree.flatten(seg)
    seg_scalar = [l.ndim == 1 for l in seg_leaves]

    def step_fun(xnext, cost, failedf, x_ref, u_ref, k_t, K_t, f_t,
                 alpha_s, *seg_t):
        # seg leaves arrive ALREADY at lane width B: Mosaic cannot compile
        # an in-kernel (d..., 1) -> (d..., B) broadcast ("Broadcast in both
        # sublanes and lanes"), so the caller materializes the per-node
        # parameters at (T, d..., B) — ~66 MB for the benchmark problem,
        # hoisted loop-invariant by XLA
        seg_t_tree = jax.tree.unflatten(seg_def, list(seg_t))
        gap_scale = alpha_s - 1.0
        x_try = lane_integrate(has_ff, nq, nv, xnext, gap_scale * f_t)
        dx, _ = _lane_state_diff(has_ff, nq, nv, x_ref, x_try)
        u_try = u_ref - alpha_s * k_t - lmv(K_t, dx)
        xnext_new, c = lane_calc_primal(seg_t_tree, x_try, u_try)
        cost_new = cost + c[None]
        bad = ~((jnp.abs(cost_new[0]) < 1e30)
                & (jnp.max(jnp.abs(xnext_new), axis=0) < 1e30))
        failed = jnp.maximum(failedf, bad.astype(dt)[None])
        return [xnext_new, cost_new, failed, x_try, u_try]

    seg_t_ex = [jnp.zeros(((B,) if l.ndim == 1 else l.shape[1:] + (B,)),
                          l.dtype) for l in seg_leaves]
    step_ex = ([jnp.zeros((nx, B), dt), jnp.zeros((1, B), dt),
                jnp.zeros((1, B), dt), jnp.zeros((nx, B), dt),
                jnp.zeros((nu, B), dt), jnp.zeros((nu, B), dt),
                jnp.zeros((nu, ndx, B), dt), jnp.zeros((ndx, B), dt),
                jnp.zeros((), dt)] + seg_t_ex)
    step_body, step_consts = _hoist(step_fun, step_ex)

    def lift(a):
        """(T, d...) -> (T, d..., B) materialized at lane width; (T,)
        scalars -> (T, 1, B) so the time axis stays untiled."""
        if a.ndim == 1:
            return jnp.broadcast_to(a[:, None, None], (a.shape[0], 1, B))
        return jnp.broadcast_to(a[..., None], a.shape + (B,))

    if interpret:
        # pure-XLA lane fallback (see riccati_backward_lanes note)
        def scan_step(carry, inp):
            xnext, cost, failedf = carry
            seg_t = inp[:n_seg_]
            x_t, u_t, k_t, K_t, f_t = inp[n_seg_:]
            outs = step_fun(xnext, cost, failedf, x_t, u_t, k_t, K_t, f_t,
                            jnp.asarray(alpha, dt), *seg_t)
            xnext_new, cost_new, failed, x_try, u_try = outs
            return (xnext_new, cost_new, failed), (x_try, u_try)

        n_seg_ = len(seg_leaves)
        carry0 = (x0_l, jnp.zeros((1, B), dt), jnp.zeros((1, B), dt))
        # per-step leaves at lane width B: scalars (T, B), others (T, d.., B)
        seg_scan = tuple(
            jnp.broadcast_to(l[:, None], (l.shape[0], B)) if l.ndim == 1
            else jnp.broadcast_to(l[..., None], l.shape + (B,))
            for l in seg_leaves)
        (x_last, cost, failed), (xs_try, us_try) = jax.lax.scan(
            scan_step, carry0,
            seg_scan + (xs_l, us_l, k_l, K_l, fs_l))
        return xs_try, us_try, x_last, cost[0], failed[0] > 0.5

    step_ins = ([lift(l) for l in seg_leaves]
                + [xs_l, us_l, k_l, K_l, fs_l])
    whole_ins = [x0_l, jnp.reshape(alpha, (1, 1))]
    n_seg = len(seg_leaves)
    n_step = len(step_ins)
    n_whole = len(whole_ins)
    n_sc = len(step_consts)

    def blk_spec(a):
        shp = (1,) + tuple(a.shape[1:])
        nrest = len(shp) - 1
        return pl.BlockSpec(shp, lambda t, _n=nrest: (t,) + (0,) * _n)

    def whole_spec(a):
        return pl.BlockSpec(tuple(a.shape),
                            lambda t, _n=a.ndim: (0,) * _n)

    def kernel(*refs):
        i = 0
        s_refs = refs[i:i + n_step]; i += n_step
        w_refs = refs[i:i + n_whole]; i += n_whole
        sc_refs = refs[i:i + n_sc]; i += n_sc
        xs_o, us_o, xlast_o, cost_o, failed_o = refs[i:i + 5]
        x_s, cost_s, fail_s = refs[i + 5:]
        t = pl.program_id(0)
        scs = [r[...] for r in sc_refs]
        alpha_s = w_refs[1][0, 0]

        @pl.when(t == 0)
        def _():
            x_s[...] = w_refs[0][...]
            cost_s[...] = jnp.zeros((1, B), dt)
            fail_s[...] = jnp.zeros((1, B), dt)

        seg_refs = s_refs[:n_seg]
        xs_r, us_r, k_r, K_r, fs_r = s_refs[n_seg:]
        seg_t = [r[0, 0] if sc else r[0]
                 for r, sc in zip(seg_refs, seg_scalar)]  # scalars -> (B,)
        outs = step_body(*scs, x_s[...], cost_s[...], fail_s[...],
                         xs_r[0], us_r[0], k_r[0], K_r[0], fs_r[0],
                         alpha_s, *seg_t)
        xnext_new, cost_new, failed, x_try, u_try = outs
        x_s[...] = xnext_new
        cost_s[...] = cost_new
        fail_s[...] = failed
        xs_o[...] = x_try[None]
        us_o[...] = u_try[None]
        xlast_o[...] = xnext_new
        cost_o[...] = cost_new
        failed_o[...] = failed

    out_shapes = [
        jax.ShapeDtypeStruct((T, nx, B), dt),
        jax.ShapeDtypeStruct((T, nu, B), dt),
        jax.ShapeDtypeStruct((nx, B), dt),
        jax.ShapeDtypeStruct((1, B), dt),
        jax.ShapeDtypeStruct((1, B), dt),
    ]
    out_specs = ([blk_spec(s) for s in out_shapes[:2]]
                 + [whole_spec(s) for s in out_shapes[2:]])
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
    scratch = [pltpu.VMEM((nx, B), dt), pltpu.VMEM((1, B), dt),
               pltpu.VMEM((1, B), dt)]
    xs_try, us_try, x_last, cost, failed = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=([blk_spec(a) for a in step_ins]
                  + [whole_spec(a) for a in whole_ins]
                  + [whole_spec(c) for c in step_consts]),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **kw,
    )(*step_ins, *whole_ins, *step_consts)
    return xs_try, us_try, x_last, cost[0], failed[0] > 0.5
