"""Quadrupedal walking with control bounds via Box-FDDP
(reference: examples/quadrupedal_walk_ubound.py)."""

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
from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
from crocoddyl_tpu.dynamics import robots


def main(step_knots=25, support_knots=2, maxiter=150):
    m = robots.quadruped()
    q0 = robots.quadruped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    problem = fac.walking_problem(np.asarray(x0), step_length=0.25,
                                  step_height=0.15, dt=1e-2,
                                  step_knots=step_knots,
                                  support_knots=support_knots)
    lim = np.asarray(m.effort_limit)[6:]
    xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
    us = problem.quasi_static(xs)
    sol = ct.solve(problem, xs_init=xs, us_init=us,
                   settings=ct.box_fddp_settings(maxiter=maxiter),
                   u_lb=jnp.asarray(-lim), u_ub=jnp.asarray(lim))
    ct.print_trace(sol, "quadrupedal_walk_ubound")
    print("converged:", bool(sol.converged), " cost:", float(sol.cost),
          " max|u|:", float(jnp.max(jnp.abs(sol.us))))
    return sol


if __name__ == "__main__":
    main()
