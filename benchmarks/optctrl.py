"""Benchmark harness parity with the reference's benchmark mains.

Mirrors benchmark/{unicycle,lqr,arm-manipulation,quadrupedal-gaits,
bipedal-timings,boxqp}-optctrl.cpp: each problem is built at the reference
size, then `solve` (maxiter=1), `problem.calc` and `problem.calc_diff` are
timed over N trials, reporting AVG/MIN/MAX ms — plus the batched-throughput
column that is the TPU-native reason to exist.

Usage:  python -m benchmarks.optctrl [unicycle|lqr|arm|quadruped|biped|boxqp]
        [--trials N] [--batch B] [--f64]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def _stats(fn, trials):
    fn()  # warmup (compile)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    return ts.mean(), ts.min(), ts.max()


def _report(name, avg, mn, mx, extra=""):
    print(f"  {name:<28s} AVG={avg:9.3f} ms  MIN={mn:9.3f}  MAX={mx:9.3f}"
          f"  {extra}")


def build_unicycle(dtype):
    """benchmark/unicycle-optctrl.cpp: T=200."""
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.models.unicycle import UnicycleModel
    m = UnicycleModel(dt=jnp.asarray(0.1, dtype),
                      cost_weights=jnp.asarray([10.0, 1.0], dtype))
    x0 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    return ShootingProblem(x0=x0, running=replicate_model(m, 200), terminal=m)


def build_lqr(dtype):
    """benchmark/lqr-optctrl.cpp: nx=37, nu=12 (matches its dims), T=100."""
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.models.lqr import random_lqr_model
    m = random_lqr_model(jax.random.PRNGKey(0), nx=37, nu=12, dtype=dtype)
    x0 = jnp.ones((37,), dtype)
    return ShootingProblem(x0=x0, running=replicate_model(m, 100), terminal=m)


def build_arm(dtype):
    """benchmark/arm-manipulation-optctrl.cpp: 7-dof arm reaching, T=100."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from examples.arm_manipulation import make_problem
    prob, _, _ = make_problem(T=100, dt=1e-3)
    from crocoddyl_tpu.utils.casting import cast_floats
    return cast_floats(prob, dtype)


def build_quadruped(dtype):
    """benchmark/quadrupedal-gaits-optctrl.cpp: walk, T=108."""
    from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
    from crocoddyl_tpu.dynamics import robots
    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    m = robots.quadruped(dtype=np_dtype)
    q0 = robots.quadruped_standing_q(m, dtype=np_dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, dtype)])
    fac = QuadrupedGaitFactory(m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
                               default_q=np.asarray(q0))
    return fac.walking_problem(x0, 0.25, 0.15, 1e-2, step_knots=25,
                               support_knots=2)


def build_biped(dtype):
    """benchmark/bipedal-timings.cpp: walk, reference knots."""
    from crocoddyl_tpu.apps.gaits import BipedGaitFactory
    from crocoddyl_tpu.dynamics import robots
    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    m = robots.biped(dtype=np_dtype)
    q0 = robots.biped_standing_q(m, dtype=np_dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, dtype)])
    fac = BipedGaitFactory(m, ["right_sole", "left_sole"],
                           default_q=np.asarray(q0))
    return fac.walking_problem(x0, 0.6, 0.1, 0.03, step_knots=35,
                               support_knots=10)


def bench_problem(problem, trials, batch):
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve

    T = problem.T
    xs = jnp.tile(problem.x0[None], (T + 1, 1))
    us = problem.quasi_static(xs)
    settings = SolverSettings(maxiter=1, record_trace=False)

    solve_j = jax.jit(lambda: solve(problem, xs_init=xs, us_init=us,
                                    settings=settings).cost)
    calc_j = jax.jit(lambda: problem.calc(xs, us)[1].sum())
    cdiff_j = jax.jit(lambda: jax.tree_util.tree_leaves(
        problem.calc_diff(xs, us))[0].sum())

    _report("solve (maxiter=1)", *_stats(lambda: solve_j().block_until_ready(),
                                         trials))
    _report("problem.calc", *_stats(lambda: calc_j().block_until_ready(),
                                    trials))
    _report("problem.calc_diff", *_stats(lambda: cdiff_j().block_until_ready(),
                                         trials))

    if batch > 1:
        bsolve = jax.jit(lambda x0s: jax.vmap(
            lambda x0: solve(problem.replace(x0=x0), xs_init=xs, us_init=us,
                             settings=settings).cost)(x0s))
        x0s = jnp.tile(problem.x0[None], (batch, 1))
        avg, mn, mx = _stats(lambda: bsolve(x0s).block_until_ready(), trials)
        _report(f"batched solve (B={batch})", avg, mn, mx,
                extra=f"→ {batch / (avg / 1e3):8.1f} solves/s")


def bench_boxqp(trials, batch, dtype):
    """benchmark/boxqp.cpp: nx=500 random box QP."""
    from crocoddyl_tpu.core.solvers import boxqp
    nx = 500
    key = jax.random.PRNGKey(42)
    A = jax.random.normal(key, (nx, nx), dtype)
    H = A @ A.T + nx * jnp.eye(nx, dtype=dtype)
    q = jax.random.normal(jax.random.PRNGKey(1), (nx,), dtype)
    lb, ub = -jnp.ones((nx,), dtype), jnp.ones((nx,), dtype)
    x0 = jnp.zeros((nx,), dtype)
    f = jax.jit(lambda: boxqp.solve(H, q, lb, ub, x0).x.sum())
    _report("BoxQP nx=500", *_stats(lambda: f().block_until_ready(), trials))


BUILDERS = {"unicycle": build_unicycle, "lqr": build_lqr, "arm": build_arm,
            "quadruped": build_quadruped, "biped": build_biped}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*",
                    default=["unicycle", "lqr"],
                    choices=list(BUILDERS) + ["boxqp"])
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}")
    for w in args.which:
        print(f"[{w}]")
        if w == "boxqp":
            bench_boxqp(args.trials, args.batch, dtype)
        else:
            bench_problem(BUILDERS[w](dtype), args.trials, args.batch)


if __name__ == "__main__":
    main()
