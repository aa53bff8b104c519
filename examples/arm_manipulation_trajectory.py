"""Arm multi-waypoint trajectory: 4 reaching phases chained into one OCP
(reference: examples/arm_manipulation_trajectory.py — four FrameTranslation
targets, each phase with running goal w=1e1, xReg 1e-1, ctrlReg 1e-3 and a
terminal goal w=1e5 knot)."""

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
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import ActivationQuad
from crocoddyl_tpu.models.multibody.actuations import FullActuation
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFrameTranslation, CostState)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode

TARGETS = np.array([
    [0.2, 0.2, -0.3],
    [0.2, -0.2, -0.3],
    [0.2, -0.2, -0.6],
    [0.2, 0.2, -0.6],
])


def make_problem(T_phase=50, dt=5e-3):
    m = robots.arm7()
    st = StateMultibody(model=m)
    fid = m.frame_id("gripper")
    q0 = jnp.asarray(np.array([0.5, 0.6, -0.8, 1.2, 0.4, 0.3, 0.0]))
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])

    def node(target, w_goal, dt_):
        costs = CostStack(items=(
            CostFrameTranslation(fid=fid, pref=jnp.asarray(target),
                                 activation=ActivationQuad(),
                                 weight=jnp.asarray(w_goal),
                                 active=jnp.asarray(1.0)),
            CostState(xref=x0, activation=ActivationQuad(),
                      weight=jnp.asarray(1e-1), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(m.nv), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-3), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st, actuation=FullActuation(nv=m.nv),
                             costs=costs, dt=jnp.asarray(dt_))

    models = []
    for k, tgt in enumerate(TARGETS):
        models += [node(tgt, 1e1, dt)] * (T_phase - 1)
        # waypoint knot: boosted goal weight (the reference's per-phase
        # terminal cost, arm_manipulation_trajectory.py:68-80)
        models.append(node(tgt, 1e5 * dt, dt))
    problem = ct.ShootingProblem(x0=x0, running=ct.stack_models(models),
                                 terminal=node(TARGETS[-1], 1e5, 0.0))
    return problem, fid, m


def main():
    problem, fid, m = make_problem()
    sol = ct.solve(problem, settings=ct.fddp_settings(maxiter=200))
    ct.print_trace(sol, "arm_manipulation_trajectory")
    from crocoddyl_tpu.dynamics import algorithms as algo
    errs = []
    for k, tgt in enumerate(TARGETS):
        xk = sol.xs[(k + 1) * 50]
        kin = algo.KinData(m, xk[:m.nq], xk[m.nq:])
        errs.append(float(np.linalg.norm(
            np.asarray(kin.frame_placement(fid).p) - tgt)))
    print("converged:", bool(sol.converged), " cost:", float(sol.cost),
          " waypoint errors:", np.round(errs, 4))
    return sol


if __name__ == "__main__":
    main()
