"""Box-FDDP vs Box-DDP comparison on a control-limited reaching task
(reference: examples/boxfddp_vs_boxddp.py)."""

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
from examples.arm_manipulation import make_problem


def main():
    problem, fid, m = make_problem(T=60, dt=2e-3)
    lim = np.asarray(m.effort_limit)
    u_lb = jnp.asarray(-0.15 * lim)
    u_ub = jnp.asarray(0.15 * lim)
    out = {}
    for name, settings in (
            ("BoxDDP", ct.box_ddp_settings(maxiter=100)),
            ("BoxFDDP", ct.box_fddp_settings(maxiter=100))):
        sol = ct.solve(problem, settings=settings, u_lb=u_lb, u_ub=u_ub)
        ct.print_trace(sol, name)
        print(f"{name}: iters={int(sol.iter)} cost={float(sol.cost):.6g} "
              f"max|u|/lim={float(jnp.max(jnp.abs(sol.us) / u_ub)):.3f}")
        out[name] = sol
    return out


if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
