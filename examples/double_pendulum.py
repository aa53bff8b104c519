"""Double-pendulum swing-up (reference: examples/double_pendulum.py with
utils/pendulum.py costs; golden log examples/log/double_pendulum.log).

Pass ``ubound=True`` for the squashed-control variant
(double_pendulum_ubound)."""

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
    Actuation, SmoothSatSquashing, SquashingActuation,
)
from crocoddyl_tpu.models.multibody.costs import CostControl, CostState
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


class SecondJointActuation(Actuation):
    """Acrobot-style: only the second joint is actuated
    (utils/pendulum.py ActuationModelDoublePendulum)."""

    @property
    def nu(self) -> int:
        return 1

    def calc(self, x, u):
        return jnp.concatenate([jnp.zeros((1,), u.dtype), u])


def make_problem(T=100, dt=1e-2, ubound=False):
    m = robots.double_pendulum()
    st = StateMultibody(model=m)
    # upright target: q = (pi, 0) measured from hanging-down zero
    xref = jnp.asarray([np.pi, 0.0, 0.0, 0.0])
    x0 = jnp.zeros(4)

    act: Actuation = SecondJointActuation(nv=m.nv)
    if ubound:
        act = SquashingActuation(
            nv=m.nv, actuation=act,
            squashing=SmoothSatSquashing(s_lb=jnp.asarray([-12.0]),
                                         s_ub=jnp.asarray([12.0]),
                                         smooth=jnp.asarray(0.1)))

    def node(w_goal, dt_):
        costs = CostStack(items=(
            CostState(xref=xref,
                      activation=ActivationWeightedQuad(
                          weights=jnp.asarray([1.0, 1.0, 0.1, 0.1])),
                      weight=jnp.asarray(w_goal), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(1), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-4), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st, actuation=act, costs=costs,
                             contacts=None, dt=jnp.asarray(dt_))

    running = ct.stack_models([node(1e-1, dt)] * T)
    terminal = node(1e4, 0.0)
    return ct.ShootingProblem(x0=x0, running=running, terminal=terminal)


def main(ubound=False):
    problem = make_problem(ubound=ubound)
    sol = ct.solve(problem, settings=ct.SolverSettings(maxiter=300))
    ct.print_trace(sol, "double_pendulum" + ("_ubound" if ubound else ""))
    print("final state:", np.asarray(sol.xs[-1]))
    return sol


if __name__ == "__main__":
    import sys
    main(ubound="ubound" in sys.argv)
