"""Cartpole swing-up (reference: examples/notebooks/cartpole_swing_up.ipynb —
user-defined action model; here built from the rigid-body stack directly)."""

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
from crocoddyl_tpu.models.multibody.actuations import Actuation
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFrameTranslation, CostState,
)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode
from flax import struct


class CartActuation(Actuation):
    """Force on the cart only (pole unactuated) — the notebook's u → [u, 0]."""

    @property
    def nu(self) -> int:
        return 1

    def calc(self, x, u):
        return jnp.concatenate([u, jnp.zeros((self.nv - 1,), u.dtype)])


def make_problem(T=50, dt=5e-2):
    m = robots.cartpole()
    st = StateMultibody(model=m)
    tip = m.frame_id("pole_tip")
    x0 = jnp.zeros(m.nq + m.nv).at[1].set(3.14)  # pole down (3.14,
    # not exactly pi: the upright saddle has a symmetric zero
    # gradient — same trick as the reference cartpole notebook)

    def node(w_goal, dt_):
        costs = CostStack(items=(
            # tip above the cart = upright pole
            CostFrameTranslation(fid=tip, pref=jnp.asarray([0.0, 0.0, 1.0]),
                                 activation=ActivationQuad(),
                                 weight=jnp.asarray(w_goal),
                                 active=jnp.asarray(1.0)),
            CostState(xref=jnp.zeros(m.nq + m.nv),
                      activation=ActivationWeightedQuad(
                          weights=jnp.asarray([1.0, 0.0, 0.1, 0.1])),
                      weight=jnp.asarray(1e-2), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(1), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-3), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st, actuation=CartActuation(nv=m.nv),
                             costs=costs, contacts=None, dt=jnp.asarray(dt_))

    running = ct.stack_models([node(1.0, dt)] * T)
    terminal = node(1e4, 0.0)
    return ct.ShootingProblem(x0=x0, running=running, terminal=terminal)


def main(maxiter=1000):
    problem = make_problem()
    sol = ct.solve(problem, settings=ct.SolverSettings(maxiter=maxiter))
    ct.print_trace(sol, "cartpole_swingup")
    print("final state:", np.asarray(sol.xs[-1]))
    return sol


if __name__ == "__main__":
    main()
