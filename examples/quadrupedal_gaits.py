"""Quadrupedal gaits: walking / trotting / pacing / bounding / jumping
(reference: examples/quadrupedal_gaits.py; golden log
examples/log/quadrupedal_gaits.log — walking converges in ~13 iterations)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd
if _os.environ.get("CROCODDYL_TPU_EXAMPLES_BACKEND", "cpu64") == "cpu64":
    # examples are analysis scripts: run f64 on CPU like the
    # reference (set CROCODDYL_TPU_EXAMPLES_BACKEND=native to keep
    # the default device/precision, e.g. TPU f32)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_enable_x64", True)

import sys

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
from crocoddyl_tpu.dynamics import robots

GAITS = {
    "walking": dict(step_length=0.25, step_height=0.15, dt=1e-2,
                    step_knots=25, support_knots=2),
    "trotting": dict(step_length=0.15, step_height=0.1, dt=1e-2,
                     step_knots=25, support_knots=2),
    "pacing": dict(step_length=0.15, step_height=0.1, dt=1e-2,
                   step_knots=25, support_knots=5),
    "bounding": dict(step_length=0.007, step_height=0.05, dt=1e-2,
                     step_knots=25, support_knots=12),
    "jumping": dict(jump_height=0.15, jump_length=[0.0, 0.3, 0.0], dt=1e-2,
                    ground_knots=10, flying_knots=20),
}


def main(which=("walking",)):
    m = robots.quadruped()
    q0 = robots.quadruped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    sols = {}
    for gait in which:
        params = GAITS[gait]
        if gait == "jumping":
            problem = fac.jumping_problem(x0, **params)
        else:
            problem = getattr(fac, f"{gait}_problem")(x0, **params)
        xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
        us = problem.quasi_static(xs)
        sol = ct.solve(problem, xs_init=xs, us_init=us,
                       settings=ct.SolverSettings(maxiter=150))
        ct.print_trace(sol, gait)
        print(f"{gait}: converged={bool(sol.converged)} "
              f"iters={int(sol.iter)} cost={float(sol.cost):.6g}")
        sols[gait] = sol
    return sols


if __name__ == "__main__":
    main(sys.argv[1:] or ("walking",))
