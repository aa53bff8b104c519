"""Receding-horizon MPC: rotate the horizon, shift the warm start, replan.

The reference's MPC story (SURVEY §5): ShootingProblem::circularAppend
(core/optctrl/shooting.hpp:112-129) rotates the node list each control tick
and the solver is warm-started from the shifted previous solution
(solver-base.hpp:126-137 setCandidate).  Here the full replan step —
plant step, horizon rotation, warm-start shift, maxiter-limited solve — is
ONE jitted program, so the per-replan latency printed at the end is the
on-device MPC tick time.

Default problem: unicycle (T=20, fast).  --quadruped replans the ANYmal
walking gait (T=108, the benchmark problem; first compile is slow).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.mpc import circular_append, shift_warm_start
from crocoddyl_tpu.models.unicycle import UnicycleModel


def unicycle_setup():
    m = UnicycleModel()
    T = 20
    prob = ct.ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                              running=ct.replicate_model(m, T), terminal=m)
    return prob, ct.SolverSettings(maxiter=100, record_trace=False), \
        ct.SolverSettings(maxiter=2, record_trace=False,
                          parallel_linesearch=False)


def quadruped_setup():
    from bench import quadruped_problem
    prob, _ = quadruped_problem(jnp.float32 if jax.default_backend() == "tpu"
                                else jnp.float64)
    return prob, ct.SolverSettings(maxiter=60, record_trace=False,
                                   parallel_linesearch=False), \
        ct.SolverSettings(maxiter=1, record_trace=False,
                          parallel_linesearch=False)


def main(which="unicycle", n_replans=50):
    prob, settings0, replan_settings = (
        quadruped_setup() if which == "quadruped" else unicycle_setup())

    # initial plan (cold solve)
    xs0 = jnp.tile(prob.x0[None], (prob.T + 1, 1))
    us0 = prob.quasi_static(xs0)
    sol = ct.solve(prob, xs_init=xs0, us_init=us0, settings=settings0)
    print(f"initial solve: converged={bool(sol.converged)} "
          f"iters={int(sol.iter)} cost={float(sol.cost):.6g}")

    @jax.jit
    def replan_step(prob, xs, us):
        # plant: apply the first control of the current plan
        node0 = jax.tree.map(lambda l: l[0], prob.segments[0])
        x_next, _ = node0.calc(prob.x0, us[0])
        prob2 = circular_append(prob, new_x0=x_next)
        xs2, us2 = shift_warm_start(xs, us, x_next)
        s = ct.solve(prob2, xs_init=xs2, us_init=us2,
                     settings=replan_settings)
        return prob2, s

    xs, us = sol.xs, sol.us
    prob_i = prob
    # warmup/compile
    prob_i, s = replan_step(prob_i, xs, us)
    jax.block_until_ready(s.cost)
    xs, us = s.xs, s.us

    lats, costs = [], []
    for _ in range(n_replans):
        t0 = time.perf_counter()
        prob_i, s = replan_step(prob_i, xs, us)
        jax.block_until_ready(s.cost)
        lats.append((time.perf_counter() - t0) * 1e3)
        xs, us = s.xs, s.us
        costs.append(float(s.cost))
        assert not bool(s.diverged), "MPC replan diverged"

    lats = np.asarray(lats)
    print(f"{which} MPC: {n_replans} replans, "
          f"latency p50={np.median(lats):.3f} ms "
          f"p90={np.percentile(lats, 90):.3f} ms "
          f"(cost {costs[0]:.4g} -> {costs[-1]:.4g})")
    return lats, costs


if __name__ == "__main__":
    main("quadruped" if "--quadruped" in sys.argv else "unicycle")
