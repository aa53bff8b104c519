"""Humanoid manipulation: reach a gripper goal while keeping double-support
contact balance (reference: examples/humanoid_manipulation.py)."""

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
from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import (
    ActivationQuad, ActivationWeightedQuad,
)
from crocoddyl_tpu.models.multibody.actuations import FloatingBaseActuation
from crocoddyl_tpu.models.multibody.contacts import Contact6D, ContactSet
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFramePlacement, CostState,
)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


def make_problem(T=30, dt=2e-2, target=(0.4, 0.2, 1.0)):
    m = robots.humanoid()
    st = StateMultibody(model=m)
    q0 = robots.humanoid_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    gid = m.frame_id("left_gripper")
    nu = m.nv - 6

    # 6D sole contacts at the initial placements
    oMi, _ = algo.forward_kinematics(m, q0)
    contacts = []
    for fname in ("right_sole", "left_sole"):
        fid = m.frame_id(fname)
        M = algo.frame_placement(m, oMi, fid)
        contacts.append(Contact6D(fid=fid, ref_R=M.R, ref_p=M.p,
                                  gains=jnp.asarray([0.0, 50.0]),
                                  active=jnp.asarray(1.0)))
    contact_set = ContactSet(contacts=tuple(contacts))

    sw = np.full(2 * m.nv, 0.01)
    sw[:6] = 10.0   # keep the base steady
    sw[m.nv:m.nv + 6] = 10.0

    def node(w_goal, dt_):
        costs = CostStack(items=(
            CostFramePlacement(fid=gid, ref_R=jnp.eye(3),
                               ref_p=jnp.asarray(np.asarray(target)),
                               activation=ActivationQuad(),
                               weight=jnp.asarray(w_goal),
                               active=jnp.asarray(1.0)),
            CostState(xref=x0,
                      activation=ActivationWeightedQuad(
                          weights=jnp.asarray(sw)),
                      weight=jnp.asarray(1e1), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(nu), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-3), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st,
                             actuation=FloatingBaseActuation(nv=m.nv),
                             costs=costs, contacts=contact_set,
                             dt=jnp.asarray(dt_))

    running = ct.stack_models([node(1e2, dt)] * T)
    terminal = node(1e4, 0.0)
    return ct.ShootingProblem(x0=x0, running=running, terminal=terminal), gid, m


def main(T=30, maxiter=100):
    problem, gid, m = make_problem(T=T)
    xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
    us = problem.quasi_static(xs)
    sol = ct.solve(problem, xs_init=xs, us_init=us,
                   settings=ct.SolverSettings(maxiter=maxiter))
    ct.print_trace(sol, "humanoid_manipulation")
    qT = sol.xs[-1][:m.nq]
    oMi, _ = algo.forward_kinematics(m, qT)
    print("final gripper:", np.asarray(algo.frame_placement(m, oMi, gid).p))
    return sol


if __name__ == "__main__":
    main()
