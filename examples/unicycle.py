"""Unicycle point-stabilization (reference: examples/unicycle_towards_origin.py,
golden log examples/log/unicycle_towards_origin.log)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd
if _os.environ.get("CROCODDYL_TPU_EXAMPLES_BACKEND", "cpu64") == "cpu64":
    # examples are analysis scripts: run f64 on CPU like the
    # reference (set CROCODDYL_TPU_EXAMPLES_BACKEND=native to keep
    # the default device/precision, e.g. TPU f32)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.models.unicycle import UnicycleModel


def main():
    model = UnicycleModel()
    T = 20
    problem = ct.ShootingProblem(
        x0=jnp.asarray([-1.0, -1.0, 1.0]),
        running=ct.replicate_model(model, T), terminal=model)
    sol = ct.solve(problem, settings=ct.SolverSettings(maxiter=100))
    ct.print_trace(sol, "unicycle")
    print("converged:", bool(sol.converged), " cost:", float(sol.cost))
    return sol


if __name__ == "__main__":
    main()
