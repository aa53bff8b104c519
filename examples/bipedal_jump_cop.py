"""CoP-constrained bipedal jumping — the thesis fork's jump experiment.

Reference: RH5/jump.py + RH5/utils/jumpProblem.py (vertical / forward jumps
with Contact-Stability (CoP) costs on the supporting soles, weight 1e3 with
a [0, inf) quadratic barrier) over the SimpleBipedGaitProblem jump recipe
(utils/biped.py:67-116 createJumpingProblem).

Run:  python examples/bipedal_jump_cop.py [--forward]
      (--forward adds a 0.3 m forward displacement to the jump)
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
import sys

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import BipedGaitFactory
from crocoddyl_tpu.dynamics import robots

FOOT_LENGTH, FOOT_WIDTH = 0.2, 0.08   # RH5 sole box (jumpProblem.py CoP frame)


class CoPJumpFactory(BipedGaitFactory):
    """Biped jump with CoP support costs on every supporting sole."""

    cop_box = (FOOT_LENGTH, FOOT_WIDTH)
    w_cop = 1e3                        # RH5 CoP weight


def make_problem(forward=False, ground_knots=12, flying_knots=8, dt=3e-2):
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = CoPJumpFactory(m, ["right_sole", "left_sole"],
                         default_q=np.asarray(q0))
    jump_length = [0.3 if forward else 0.0, 0.0, 0.0]
    prob = fac.jumping_problem(x0, jump_height=0.1, jump_length=jump_length,
                               dt=dt, ground_knots=ground_knots,
                               flying_knots=flying_knots)
    return prob, x0


def main(forward=False):
    problem, x0 = make_problem(forward=forward)
    xs0 = jnp.tile(jnp.asarray(x0)[None], (problem.T + 1, 1))
    us0 = problem.quasi_static(xs0)
    sol = ct.solve(problem, xs_init=xs0, us_init=us0,
                   settings=ct.SolverSettings(maxiter=200))
    ct.print_trace(sol, "bipedal_jump_cop" + ("_forward" if forward else ""))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bipedal_walk_cop import cop_in_support
    worst = cop_in_support(problem, sol)
    print("worst CoP-barrier violation (>= 0 is inside support):",
          f"{worst:.3e}")
    return sol


if __name__ == "__main__":
    main(forward="--forward" in sys.argv)
