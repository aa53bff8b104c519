"""Per-stage TPU timing split for the quadruped-gait benchmark problem.

The reference precedent is benchmark/arm-manipulation-timings.cpp:140-447,
which times every layer separately (state ops, each cost, ContactDAM
calc/calcDiff, DAM+Euler).  Here the stages are the solver's building
blocks at benchmark size (B x T = 128 x 108):

  calc        - batched node evaluation (rollout dynamics + costs)
  calc_diff   - batched node derivatives (the suspected hot spot)
  backward    - Riccati recursion (sequential scan over T, batched over B)
  forward     - one line-search rollout (sequential scan over T)
  solve1      - full maxiter=1 solve

Usage: python -m benchmarks.profile_stages [--batch B] [--trials N]
       [--trace DIR]   (writes a jax.profiler trace viewable in xprof)
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def _time(fn, trials):
    fn()  # compile + warmup
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    return ts.mean(), ts.min()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--problem", type=str, default="quadruped")
    args = ap.parse_args()

    from bench import quadruped_problem, unicycle_problem
    from crocoddyl_tpu.core.solvers import fddp

    dtype = jnp.float32
    if args.problem == "quadruped":
        prob, x0 = quadruped_problem(dtype)
    else:
        prob, x0 = unicycle_problem(dtype)
    T = prob.T
    B = args.batch
    st = prob.state

    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = prob.quasi_static(xs0)
    xs_b = jnp.tile(xs0[None], (B, 1, 1))
    us_b = jnp.tile(us0[None], (B, 1, 1))

    key = jax.random.PRNGKey(0)
    noise = 0.01 * jax.random.normal(key, (B, x0.shape[0]), dtype)
    if args.problem == "quadruped":
        noise = noise.at[:, : x0.shape[0] - st.nv].set(0.0)
    x0s = x0[None] + noise

    calc_j = jax.jit(jax.vmap(lambda xs, us: prob.calc(xs, us)[1].sum()))
    cdiff_j = jax.jit(jax.vmap(
        lambda xs, us: jax.tree_util.tree_leaves(
            prob.calc_diff(xs, us))[0].sum()))

    def bw(xs, us):
        derivs, dterm, fs, _ = fddp._calc_diff(prob, xs, us,
                                               jnp.zeros((), bool))
        out = fddp._backward_pass(derivs, dterm, fs,
                                  jnp.asarray(1e-9, dtype),
                                  jnp.asarray(1e-9, dtype))
        return out[0].sum() + out[4].sum()

    # backward-only: precompute derivs once outside the timed region
    derivs1, dterm1, fs1, _ = jax.jit(jax.vmap(
        lambda xs, us: fddp._calc_diff(prob, xs, us, jnp.zeros((), bool))))(
            xs_b, us_b)

    bw_only = jax.jit(jax.vmap(
        lambda d, dt_, f: fddp._backward_pass(
            d, dt_, f, jnp.asarray(1e-9, dtype),
            jnp.asarray(1e-9, dtype))[4].sum()))

    k0 = jnp.zeros((B, T, prob.running.nu), dtype)
    K0 = jnp.zeros((B, T, prob.running.nu, st.ndx), dtype)
    fw_only = jax.jit(jax.vmap(
        lambda xs, us, k, K, f: fddp._forward_pass(
            prob, xs, us, k, K, f, jnp.asarray(1.0, dtype))[2]))

    settings = fddp.SolverSettings(maxiter=1, record_trace=False,
                                   parallel_linesearch=False)
    solve_j = jax.jit(lambda x0s: jax.vmap(
        lambda x0i: fddp.solve(prob.replace(x0=x0i), xs_init=xs0,
                               us_init=us0, settings=settings).cost)(x0s))

    stages = [
        ("calc          (B,T nodes)",
         lambda: calc_j(xs_b, us_b).block_until_ready()),
        ("calc_diff     (B,T nodes)",
         lambda: cdiff_j(xs_b, us_b).block_until_ready()),
        ("backward pass (scan T)",
         lambda: bw_only(derivs1, dterm1, fs1).block_until_ready()),
        ("forward pass  (scan T)",
         lambda: fw_only(xs_b, us_b, k0, K0, fs1).block_until_ready()),
        ("solve maxiter=1",
         lambda: solve_j(x0s).block_until_ready()),
    ]

    print(f"backend={jax.default_backend()} B={B} T={T} "
          f"ndx={st.ndx} nu={prob.running.nu}")
    results = {}
    for name, fn in stages:
        avg, mn = _time(fn, args.trials)
        results[name] = mn
        print(f"  {name:<28s} AVG={avg:9.2f} ms  MIN={mn:9.2f} ms"
              f"   ({B / (mn / 1e3):9.1f} /s)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            solve_j(x0s).block_until_ready()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
