"""Bipedal walking (reference: examples/bipedal_walk.py; golden log
examples/log/bipedal_walk.log)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd
if _os.environ.get("CROCODDYL_TPU_EXAMPLES_BACKEND", "cpu64") == "cpu64":
    # examples are analysis scripts: run f64 on CPU like the
    # reference (set CROCODDYL_TPU_EXAMPLES_BACKEND=native to keep
    # the default device/precision, e.g. TPU f32)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import BipedGaitFactory
from crocoddyl_tpu.dynamics import robots


def main(n_cycles=1, step_knots=35, support_knots=10, maxiter=150):
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = BipedGaitFactory(m, ["right_sole", "left_sole"],
                           default_q=np.asarray(q0))
    sols = []
    for _ in range(n_cycles):
        problem = fac.walking_problem(np.asarray(x0), step_length=0.6,
                                      step_height=0.1, dt=0.03,
                                      step_knots=step_knots,
                                      support_knots=support_knots)
        xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
        us = problem.quasi_static(xs)
        sol = ct.solve(problem, xs_init=xs, us_init=us,
                       settings=ct.SolverSettings(maxiter=maxiter))
        ct.print_trace(sol, "bipedal_walk")
        x0 = sol.xs[-1]
        sols.append(sol)
    return sols


if __name__ == "__main__":
    main()
