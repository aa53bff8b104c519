"""Bipedal walking with a changing gait: consecutive walking phases with
different step lengths/heights, each warm-started from the previous phase
(reference: examples/bipedal_walk_changing_gait.py — GAITPHASES list solved
sequentially with the final state of phase i seeding phase i+1)."""

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

GAITPHASES = [
    dict(step_length=0.4, step_height=0.1, dt=0.03,
         step_knots=15, support_knots=5),
    dict(step_length=0.6, step_height=0.1, dt=0.03,
         step_knots=15, support_knots=5),
    dict(step_length=0.4, step_height=0.2, dt=0.03,
         step_knots=15, support_knots=5),
]


def main(phases=None):
    phases = phases if phases is not None else GAITPHASES
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = BipedGaitFactory(m, ["right_sole", "left_sole"],
                           default_q=np.asarray(q0))
    sols = []
    for i, params in enumerate(phases):
        problem = fac.walking_problem(x0, **params)
        xs = jnp.tile(x0[None], (problem.T + 1, 1))
        us = problem.quasi_static(xs)
        sol = ct.solve(problem, xs_init=xs, us_init=us,
                       settings=ct.SolverSettings(maxiter=120))
        print(f"phase {i} {params['step_length']}/{params['step_height']}: "
              f"converged={bool(sol.converged)} iters={int(sol.iter)} "
              f"cost={float(sol.cost):.6g}")
        x0 = sol.xs[-1]   # next phase starts where this one ended
        sols.append(sol)
    return sols


if __name__ == "__main__":
    main()
