"""Benchmark: batched FDDP solves/s on the quadruped-gait problem (TPU).

Mirrors the reference benchmark harness (benchmark/quadrupedal-gaits-
optctrl.cpp:17-100): build the walking OCP at the reference size (T=108
knots: 2x2-knot double support + 4x(25 swing + 1 switch)), warm-start from
the quasi-static trajectory, and time `solve` with maxiter=1 — the MPC
replanning step.  Here the solve is batched over B problem instances
(perturbed initial states) and jitted end-to-end on the TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the driver north star (BASELINE.json): >=1000
batched FDDP solves/s on a 100-step quadruped gait (target set for a
v5p-8 slice; this runs on whatever single chip is attached).

Env knobs: BENCH_B (batch, default 32), BENCH_MAXITER (default 1),
BENCH_REPS (default 3), BENCH_PROBLEM=quadruped|unicycle.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def quadruped_problem(dtype=jnp.float32):
    from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
    from crocoddyl_tpu.dynamics import robots

    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    m = robots.quadruped(dtype=np_dtype)
    q0 = robots.quadruped_standing_q(m, dtype=np_dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, dtype)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    # reference benchmark size: T = 2*2 + 4*(25+1) = 108
    prob = fac.walking_problem(x0, 0.25, 0.15, 1e-2,
                               step_knots=25, support_knots=2)
    return prob, x0


def unicycle_problem(dtype=jnp.float32):
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.models.unicycle import UnicycleModel

    m = UnicycleModel(dt=jnp.asarray(0.1, dtype),
                      cost_weights=jnp.asarray([10.0, 1.0], dtype))
    x0 = jnp.asarray([-1.0, -1.0, 1.0], dtype)
    return ShootingProblem(x0=x0, running=replicate_model(m, 100),
                           terminal=m), x0


def main():
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve

    which = os.environ.get("BENCH_PROBLEM", "quadruped")
    B = int(os.environ.get("BENCH_B", "128"))
    maxiter = int(os.environ.get("BENCH_MAXITER", "1"))
    n_rep = int(os.environ.get("BENCH_REPS", "3"))
    dtype = jnp.float32

    if which == "quadruped":
        prob, x0 = quadruped_problem(dtype)
    else:
        prob, x0 = unicycle_problem(dtype)
    T = prob.T

    # Sequential early-exit line search: warm-started MPC steps accept the
    # first step length, so the 10-alpha parallel rollout would be ~10x
    # wasted FLOPs here (ddp.cpp:78-94 semantics).
    settings = SolverSettings(maxiter=maxiter, record_trace=False,
                              parallel_linesearch=False)

    # Warm start: quasi-static controls from the default stance, the
    # MPC-replan configuration (solver warm-started at the solution
    # neighborhood, maxiter=1 — quadrupedal-gaits-optctrl.cpp:60-72).
    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = prob.quasi_static(xs0)

    key = jax.random.PRNGKey(0)
    # perturb initial velocities only (keeps q on the manifold)
    noise = 0.01 * jax.random.normal(key, (B, x0.shape[0]), dtype)
    if which == "quadruped":
        nv = prob.state.nv
        noise = noise.at[:, : x0.shape[0] - nv].set(0.0)
    x0s = x0[None] + noise

    @jax.jit
    def run(x0s):
        def one(x0_i):
            s = solve(prob.replace(x0=x0_i), xs_init=xs0, us_init=us0,
                      settings=settings)
            return s.cost
        return jax.vmap(one)(x0s)

    costs = run(x0s)
    costs.block_until_ready()  # compile + warmup
    assert not bool(jnp.isnan(costs).any()), "NaN cost in benchmark solve"

    t0 = time.perf_counter()
    for _ in range(n_rep):
        run(x0s).block_until_ready()
    dt_s = (time.perf_counter() - t0) / n_rep

    solves_per_s = B / dt_s
    print(json.dumps({
        "metric": f"batched_fddp_{which}_T{T}_maxiter{maxiter}_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
