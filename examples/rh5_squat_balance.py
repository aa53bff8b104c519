"""RH5 thesis experiments: squat + single-leg balancing with CoP/ZMP logs.

Reference: RH5/walk.py squats/balancing configs (walkProblem.py:193-281),
CSV logging + CoP/ZMP analysis (RH5/utils/utils.py:845, :1181-1229).
Writes examples/log/rh5_{squat,balance}.csv and the solver traces.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd
if _os.environ.get("CROCODDYL_TPU_EXAMPLES_BACKEND", "cpu64") == "cpu64":
    # examples are analysis scripts: run f64 on CPU like the
    # reference (set CROCODDYL_TPU_EXAMPLES_BACKEND=native to keep
    # the default device/precision, e.g. TPU f32)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_enable_x64", True)

import os

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import BipedGaitFactory
from crocoddyl_tpu.apps.rh5 import calc_zmps, log_solution_csv
from crocoddyl_tpu.dynamics import robots

LOGDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "log")


def main(quick=False):
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = BipedGaitFactory(m, ["right_sole", "left_sole"],
                           default_q=np.asarray(q0))

    # squat: reference recipe heightChange=0.15, numKnots=70, dt=0.03
    # (RH5/walk.py:139); quick mode shrinks for CI
    nk, dt = (16, 0.06) if quick else (70, 0.03)
    squat = fac.squat_problem(x0, height_change=0.15, num_knots=nk, dt=dt)
    xs = jnp.tile(squat.x0[None], (squat.T + 1, 1))
    us = squat.quasi_static(xs)
    sol = ct.solve(squat, xs_init=xs, us_init=us,
                   settings=ct.SolverSettings(maxiter=150))
    ct.print_trace(sol, "rh5_squat")
    os.makedirs(LOGDIR, exist_ok=True)
    log_solution_csv(squat, sol, os.path.join(LOGDIR, "rh5_squat.csv"))
    zmps = calc_zmps(squat, sol)
    print(f"squat: converged={bool(sol.converged)} iters={int(sol.iter)} "
          f"cost={float(sol.cost):.6g} "
          f"zmp_x range=[{zmps[:,0].min():.3f},{zmps[:,0].max():.3f}]")

    # balancing: shift/balance knots per RH5/walk.py balancing config
    sk, bk = (3, 6) if quick else (10, 20)
    bal = fac.balancing_problem(x0, support_knots=2, shift_knots=sk,
                                balance_knots=bk, dt=0.03)
    xs = jnp.tile(bal.x0[None], (bal.T + 1, 1))
    us = bal.quasi_static(xs)
    solb = ct.solve(bal, xs_init=xs, us_init=us,
                    settings=ct.SolverSettings(maxiter=150))
    ct.print_trace(solb, "rh5_balance")
    log_solution_csv(bal, solb, os.path.join(LOGDIR, "rh5_balance.csv"))
    print(f"balance: converged={bool(solb.converged)} iters={int(solb.iter)} "
          f"cost={float(solb.cost):.6g}")
    return sol, solb


if __name__ == "__main__":
    import sys
    main(quick="--quick" in sys.argv)
