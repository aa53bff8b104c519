"""b=1 MPC replan-latency bisect for the fused-scans lane (TPU).

Times nested prefixes of one FDDP iteration (the maxiter=1 replan) with
the in-jit amortized-loop methodology (PERF_NOTES round-5 calibration:
host dispatch on this tunnel costs 25-40 ms, so every stage is measured
as K data-chained repetitions inside one jit with a single host sync).

Stages (cumulative prefixes of core/solvers/fddp.py's iteration):
  calc_diff     - fused node kernel + terminal + gaps
  +backward     - + riccati_backward_fused
  +trial        - + one trial_rollout_fused + EI/acceptance glue
  solve1        - the full maxiter=1 fscan solve (reference lane)

Usage: python -m benchmarks.profile_b1
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

FETCH_MS = 24.6  # flat host<->device fetch RTT on this tunnel (PERF_NOTES)


def amortized_ms(make_body, K=10):
    """make_body(eps, acc) -> new acc (scalar); returns per-rep device ms."""

    def loop(eps):
        def body(i, carry):
            e, acc = carry
            return (e, make_body(e, acc))
        return jax.lax.fori_loop(0, K, body,
                                 (eps, jnp.zeros((), jnp.float32)))[1]

    f = jax.jit(loop)
    float(f(jnp.asarray(0.0, jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    float(f(jnp.asarray(1e-30, jnp.float32)))
    return ((time.perf_counter() - t0) * 1e3 - FETCH_MS) / K


def main():
    import bench

    prob, x0 = bench.quadruped_problem(jnp.float32)
    from crocoddyl_tpu.core.solvers import fddp
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
    from crocoddyl_tpu.ops import fused_scans as fsc

    T = prob.T
    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    st = prob.state
    seg = prob.segments[0]
    settings = SolverSettings(maxiter=1, record_trace=False,
                              parallel_linesearch=False, fused_scans=True)

    feasible = jnp.asarray(False)

    def stage_calc_diff(e, acc):
        derivs, dterm, fs, cost = fddp._calc_diff(
            prob, xs0 + e, us0, feasible)
        return acc + cost + fs.sum() * 1e-30

    def stage_backward(e, acc):
        derivs, dterm, fs, cost = fddp._calc_diff(
            prob, xs0 + e, us0, feasible)
        Vx, Vxx, Qu, k, K_, Quuk, failed = fsc.riccati_backward_fused(
            derivs, dterm, fs, jnp.asarray(1e-9, jnp.float32),
            jnp.asarray(1e-9, jnp.float32), interpret=False)
        return acc + cost + k.sum() * 1e-30

    def stage_trial(e, acc):
        derivs, dterm, fs, cost = fddp._calc_diff(
            prob, xs0 + e, us0, feasible)
        Vx, Vxx, Qu, k, K_, Quuk, failed = fsc.riccati_backward_fused(
            derivs, dterm, fs, jnp.asarray(1e-9, jnp.float32),
            jnp.asarray(1e-9, jnp.float32), interpret=False)
        xs_r, us_r, x_last, cost_try, failed_t = fsc.trial_rollout_fused(
            seg, prob.x0 + 0.0 * e, xs0, us0, k, K_, fs,
            jnp.asarray(1.0, jnp.float32), interpret=False)
        xT = st.integrate(x_last, 0.0 * fs[-1])
        cost_try = cost_try + prob.terminal.calc_terminal(xT)
        dx = jax.vmap(st.diff)(jnp.concatenate([xs_r, xT[None]]), xs0)
        dv = -jnp.sum(fs * jnp.einsum("tij,tj->ti", Vxx, dx))
        return acc + cost + cost_try + dv * 1e-30

    def stage_solve(e, acc):
        s = solve(prob.replace(x0=prob.x0.at[-1].add(e)),
                  xs_init=xs0, us_init=us0, settings=settings)
        return acc + s.cost

    for name, body in (("calc_diff", stage_calc_diff),
                       ("calc_diff+backward", stage_backward),
                       ("calc_diff+backward+trial", stage_trial),
                       ("solve1_fscan", stage_solve)):
        try:
            ms = amortized_ms(body)
            print(f"{name:28s} {ms:8.2f} ms")
        except Exception as exc:  # pragma: no cover
            print(f"{name:28s} FAILED: {str(exc)[:160]}")


def inline_iteration_ms():
    """One hand-inlined FDDP iteration (no line-search/reg while shells,
    alpha ladder unrolled to the first trial): isolates the cost of the
    solver loop's control-flow shells vs the math itself."""
    import bench
    from crocoddyl_tpu.core.solvers import fddp
    from crocoddyl_tpu.ops import fused_scans as fsc

    prob, x0 = bench.quadruped_problem(jnp.float32)
    T = prob.T
    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    st = prob.state
    seg = prob.segments[0]
    feasible = jnp.asarray(False)

    def one_iter(e, acc):
        xs = xs0 + e
        derivs, dterm, fs, cost = fddp._calc_diff(prob, xs, us0, feasible)
        Vx, Vxx, Qu, k, K_, Quuk, failed = fsc.riccati_backward_fused(
            derivs, dterm, fs, jnp.asarray(1e-9, jnp.float32),
            jnp.asarray(1e-9, jnp.float32), interpret=False)
        dg = jnp.sum(Qu * k) - jnp.sum(Vx * fs)
        dq = -jnp.sum(k * Quuk) + jnp.sum(
            fs * jnp.einsum("tij,tj->ti", Vxx, fs))
        alpha = jnp.asarray(1.0, jnp.float32)
        xs_r, us_r, x_last, cost_try, failed_t = fsc.trial_rollout_fused(
            seg, prob.x0 + 0.0 * e, xs, us0, k, K_, fs, alpha,
            interpret=False)
        xT = st.integrate(x_last, (alpha - 1.0) * fs[-1])
        cost_try = cost_try + prob.terminal.calc_terminal(xT)
        xs_try = jnp.concatenate([xs_r, xT[None]])
        dx = jax.vmap(st.diff)(xs_try, xs)
        dv = -jnp.sum(fs * jnp.einsum("tij,tj->ti", Vxx, dx))
        d0, d1 = dg + dv, dq - 2.0 * dv
        dVexp = alpha * (d0 + 0.5 * alpha * d1)
        accept = (cost - cost_try) > 0.1 * dVexp
        stop = jnp.sum(Qu ** 2)
        return acc + jnp.where(accept, cost_try, cost) + stop * 1e-30

    return amortized_ms(one_iter)


if __name__ == "__main__":
    if os.environ.get("B1_INLINE") == "1":
        # inline lane only: one hand-inlined iteration, no solver shells
        print(f"inline_iteration          {inline_iteration_ms():8.2f} ms")
    else:
        main()
