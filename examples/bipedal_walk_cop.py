"""CoP-constrained bipedal walking — the fork's thesis contribution as a
working application.

Reference: RH5/walk.py + RH5/utils/walkProblem.py:393-398 (Contact-Stability-
constrained DDP: a CostModelContactCoPPosition with a [0, inf) quadratic
barrier and weight 1e3 on every supporting foot keeps the center of pressure
inside each foot's support rectangle) over the SimpleBipedGaitProblem recipe
(utils/biped.py:25-65).

Run:  python examples/bipedal_walk_cop.py [--impulse]
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

import sys

import numpy as np
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import BipedGaitFactory
from crocoddyl_tpu.dynamics import robots

FOOT_LENGTH, FOOT_WIDTH = 0.2, 0.08   # RH5 sole box (walkProblem.py CoP frame)


class CoPBipedGaitFactory(BipedGaitFactory):
    """Biped walking with CoP support costs on every supporting foot."""

    cop_box = (FOOT_LENGTH, FOOT_WIDTH)
    w_cop = 1e3                        # walkProblem.py:393-398


def cop_in_support(problem, sol):
    """Max CoP-barrier violation (negative A·f entries) over supporting feet
    along the solved trajectory — the thesis' contact-stability check
    (RH5/utils/utils.py calcCoPs analogue)."""
    from crocoddyl_tpu.models.multibody.costs import CostContactCoP
    worst = 0.0
    off = 0
    for seg in problem.segments:
        import jax
        T_seg = jax.tree.leaves(seg)[0].shape[0]
        for t in range(T_seg):
            m = jax.tree.map(lambda l: l[t], seg)
            if not hasattr(m, "contacts") or m.contacts is None:
                continue
            x, u = sol.xs[off + t], sol.us[off + t]
            _, cache = m._dynamics(x, u)
            for c in m.costs.items:
                if isinstance(c, CostContactCoP) and float(c.active) > 0:
                    r = np.asarray(c.residual(m.state, cache, x, u))
                    worst = min(worst, float(r.min()))
        off += T_seg
    return worst


def main(pseudo_impulse=True, step_knots=20, support_knots=9):
    m = robots.biped()
    q0 = robots.biped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = CoPBipedGaitFactory(m, ["right_sole", "left_sole"],
                              default_q=np.asarray(q0))
    problem = fac.walking_problem(x0, 0.6, 0.1, 0.03,
                                  step_knots=step_knots,
                                  support_knots=support_knots,
                                  pseudo_impulse=pseudo_impulse)
    xs0 = jnp.tile(problem.x0[None], (problem.T + 1, 1))
    us0 = problem.quasi_static(xs0)
    sol = ct.solve(problem, xs_init=xs0, us_init=us0,
                   settings=ct.SolverSettings(maxiter=150))
    ct.print_trace(sol, "bipedal_walk_cop")
    worst = cop_in_support(problem, sol)
    print(f"converged: {bool(sol.converged)}  cost: {float(sol.cost):.6g}  "
          f"worst CoP-barrier violation: {worst:.3e}")
    return sol, problem


if __name__ == "__main__":
    main(pseudo_impulse="--impulse" not in sys.argv)
