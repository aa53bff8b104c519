"""Humanoid manipulation with control bounds — BoxFDDP variant
(reference: examples/humanoid_manipulation_ubound.py: same problem as
humanoid_manipulation solved with SolverBoxFDDP under reduced effort
limits)."""

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
import sys

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.dynamics import algorithms as algo

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from humanoid_manipulation import make_problem  # noqa: E402


def main(lim_scale=0.6, T=30, maxiter=150):
    problem, gid, m = make_problem(T=T)
    lim = np.asarray(m.effort_limit)[6:] * lim_scale  # actuated joints only
    u_lb = jnp.asarray(-lim)
    u_ub = jnp.asarray(lim)
    xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
    us = problem.quasi_static(xs)
    sol = ct.solve(problem, xs_init=xs, us_init=us,
                   settings=ct.box_fddp_settings(maxiter=maxiter),
                   u_lb=u_lb, u_ub=u_ub)
    ct.print_trace(sol, "humanoid_manipulation_ubound")
    qT = sol.xs[-1][:m.nq]
    oMi, _ = algo.forward_kinematics(m, qT)
    sat = float(jnp.max(jnp.abs(sol.us) / u_ub))
    print("converged:", bool(sol.converged), " cost:", float(sol.cost),
          " max|u|/lim:", round(sat, 3))
    print("final gripper:", np.asarray(algo.frame_placement(m, oMi, gid).p))
    return sol


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
