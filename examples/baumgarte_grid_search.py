"""Baumgarte-gain grid search — RH5/plotGridSearch.py analogue, TPU-native.

The thesis fork grid-searches the contact Baumgarte stabilization gains and
compares convergence quality per gain setting (RH5/plotGridSearch.py over
RH5 walking runs).  Here the whole grid solves as ONE batched vmapped FDDP
call: the per-gain problems share a pytree structure (gains are array
leaves), so tree-stacking them gives a batch axis the TPU solves in
parallel — hyperparameter search at the cost of one solve.

Run:  python examples/baumgarte_grid_search.py
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

import numpy as np
import jax
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
from crocoddyl_tpu.dynamics import robots


def make_problem(kv, step_knots=6, support_knots=1):
    m = robots.quadruped()
    q0 = robots.quadruped_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])

    class Factory(QuadrupedGaitFactory):
        contact_gains = (0.0, float(kv))

    fac = Factory(m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
                  default_q=np.asarray(q0))
    prob = fac.walking_problem(x0, 0.15, 0.1, 1e-2,
                               step_knots=step_knots,
                               support_knots=support_knots)
    return prob, x0


def main(grid=(0.0, 12.5, 25.0, 50.0, 100.0, 200.0)):
    probs = []
    for kv in grid:
        prob, x0 = make_problem(kv)
        probs.append(prob)
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *probs)
    xs0 = jnp.tile(jnp.asarray(x0)[None], (probs[0].T + 1, 1))
    us0 = probs[0].quasi_static(xs0)
    settings = ct.SolverSettings(maxiter=60, record_trace=False)

    @jax.jit
    def sweep(ps):
        def one(p):
            s = ct.solve(p, xs_init=xs0, us_init=us0, settings=settings)
            return s.cost, s.iter, s.converged
        return jax.vmap(one)(ps)

    costs, iters, conv = sweep(stacked)
    print(f"{'Kv':>8} {'converged':>10} {'iters':>6} {'final cost':>14}")
    for kv, c, it, cv in zip(grid, costs, iters, conv):
        print(f"{kv:8.1f} {str(bool(cv)):>10} {int(it):6d} {float(c):14.6e}")

    # result artifact (RH5/plotGridSearch.py reads result trees; we commit
    # one CSV per sweep): examples/log/baumgarte_grid_search.csv
    import csv
    logdir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "log")
    _os.makedirs(logdir, exist_ok=True)
    path = _os.path.join(logdir, "baumgarte_grid_search.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["kv", "converged", "iters", "final_cost"])
        for kv, c, it, cv in zip(grid, costs, iters, conv):
            w.writerow([kv, bool(cv), int(it), float(c)])
    print("wrote", path)
    return {float(kv): (float(c), int(it), bool(cv))
            for kv, c, it, cv in zip(grid, costs, iters, conv)}


if __name__ == "__main__":
    main()
