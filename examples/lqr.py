"""LQR sanity problem (reference: benchmark/lqr-optctrl.cpp and the LQR
action models in core/actions/lqr.hpp)."""

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
from crocoddyl_tpu.models.lqr import lqr_model


def main(nx=37, nu=12, T=100):
    m = lqr_model(nx, nu)
    problem = ct.ShootingProblem(
        x0=jnp.ones((nx,)), running=ct.replicate_model(m, T), terminal=m)
    sol = ct.solve(problem, settings=ct.ddp_settings(maxiter=20))
    ct.print_trace(sol, "lqr")
    print("converged:", bool(sol.converged), "iters:", int(sol.iter))
    return sol


if __name__ == "__main__":
    main()
