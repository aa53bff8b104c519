"""Quadrotor goal flight (reference: examples/quadrotor.py, quadrotor_ubound.py;
golden log examples/log/quadrotor.log)."""

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
from crocoddyl_tpu.models.multibody.activations import (
    ActivationQuad, ActivationWeightedQuad,
)
from crocoddyl_tpu.models.multibody.actuations import (
    MultiCopterBaseActuation, SmoothSatSquashing, SquashingActuation,
)
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFramePlacement, CostState,
)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


def make_problem(T=33, dt=3e-2, target=(0.0, 0.0, 1.0), ubound=False):
    m = robots.quadrotor()
    st = StateMultibody(model=m)
    fid = m.frame_id("base_link")
    x0 = jnp.concatenate([m.neutral(), jnp.zeros(m.nv)])

    act = MultiCopterBaseActuation(
        nv=m.nv, tau_f=jnp.asarray(robots.quadrotor_tau_f()))
    if ubound:
        # u_lim from examples/quadrotor_ubound.py
        act = SquashingActuation(
            nv=m.nv, actuation=act,
            squashing=SmoothSatSquashing(
                s_lb=jnp.full((4,), 0.1), s_ub=jnp.full((4,), 5.0),
                smooth=jnp.asarray(0.1)))

    sw = jnp.asarray([0.1] * 3 + [1000.0] * 3 + [1000.0] * m.nv)

    def node(w_goal, dt_):
        costs = CostStack(items=(
            CostFramePlacement(fid=fid, ref_R=jnp.eye(3),
                               ref_p=jnp.asarray(np.asarray(target)),
                               activation=ActivationQuad(),
                               weight=jnp.asarray(w_goal),
                               active=jnp.asarray(1.0)),
            CostState(xref=x0, activation=ActivationWeightedQuad(weights=sw),
                      weight=jnp.asarray(1e-6), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(act.nu), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-6), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st, actuation=act, costs=costs,
                             contacts=None, dt=jnp.asarray(dt_))

    running = ct.stack_models([node(1e-3, dt)] * T)
    terminal = node(3.0, 0.0)
    return ct.ShootingProblem(x0=x0, running=running, terminal=terminal)


def main(ubound=False):
    problem = make_problem(ubound=ubound)
    sol = ct.solve(problem, settings=ct.SolverSettings(maxiter=200))
    ct.print_trace(sol, "quadrotor" + ("_ubound" if ubound else ""))
    print("final base pos:", np.asarray(sol.xs[-1][:3]))
    return sol


if __name__ == "__main__":
    import sys
    main(ubound="ubound" in sys.argv)
