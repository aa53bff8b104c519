"""Humanoid 'taichi' pose sequence: single-support balancing while tracking a
sequence of gripper targets (reference: examples/humanoid_taichi.py)."""

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
    CostCoM, CostControl, CostFramePlacement, CostState,
)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


def make_problem(T_phase=15, dt=2e-2):
    m = robots.humanoid()
    st = StateMultibody(model=m)
    q0 = robots.humanoid_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    gid = m.frame_id("left_gripper")
    nu = m.nv - 6

    oMi, _ = algo.forward_kinematics(m, q0)
    com0 = np.array(algo.center_of_mass(m, q0))
    placements = {}
    for fname in ("right_sole", "left_sole"):
        fid = m.frame_id(fname)
        placements[fname] = algo.frame_placement(m, oMi, fid)
    # balance over the right foot (single support), like the taichi example
    com_ref = np.array(placements["right_sole"].p)
    com_ref[2] = com0[2]

    sw = np.full(2 * m.nv, 0.01)
    sw[:6] = 10.0
    sw[m.nv:] = 1.0

    targets = [np.array([0.4, 0.1, 0.9]), np.array([0.3, 0.3, 1.2]),
               np.array([0.5, 0.0, 1.1])]

    def node(target, w_goal, support, dt_):
        contacts = []
        for fname in ("right_sole", "left_sole"):
            M = placements[fname]
            contacts.append(Contact6D(
                fid=m.frame_id(fname), ref_R=M.R, ref_p=M.p,
                gains=jnp.asarray([0.0, 50.0]),
                active=jnp.asarray(1.0 if fname in support else 0.0)))
        costs = CostStack(items=(
            CostFramePlacement(fid=gid, ref_R=jnp.eye(3),
                               ref_p=jnp.asarray(target),
                               activation=ActivationQuad(),
                               weight=jnp.asarray(w_goal),
                               active=jnp.asarray(1.0)),
            CostCoM(cref=jnp.asarray(com_ref), activation=ActivationQuad(),
                    weight=jnp.asarray(1e4), active=jnp.asarray(1.0)),
            CostState(xref=x0,
                      activation=ActivationWeightedQuad(weights=jnp.asarray(sw)),
                      weight=jnp.asarray(1e1), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(nu), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-3), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st,
                             actuation=FloatingBaseActuation(nv=m.nv),
                             costs=costs, contacts=ContactSet(tuple(contacts)),
                             dt=jnp.asarray(dt_))

    both = ("right_sole", "left_sole")
    models = []
    # phase 1: double support, shift CoM over right foot
    models += [node(targets[0], 1e1, both, dt) for _ in range(T_phase)]
    # phases 2-3: single support on the right foot, move gripper targets
    models += [node(targets[1], 1e2, ("right_sole",), dt)
               for _ in range(T_phase)]
    models += [node(targets[2], 1e2, ("right_sole",), dt)
               for _ in range(T_phase)]
    terminal = node(targets[2], 1e4, ("right_sole",), 0.0)
    return (ct.ShootingProblem(x0=x0, running=ct.stack_models(models),
                               terminal=terminal), gid, m)


def main(T_phase=15, dt=2e-2, maxiter=150):
    problem, gid, m = make_problem(T_phase=T_phase, dt=dt)
    xs = jnp.tile(problem.x0[None], (problem.T + 1, 1))
    us = problem.quasi_static(xs)
    sol = ct.solve(problem, xs_init=xs, us_init=us,
                   settings=ct.SolverSettings(maxiter=maxiter))
    ct.print_trace(sol, "humanoid_taichi")
    print("converged:", bool(sol.converged), " cost:", float(sol.cost))
    return sol


if __name__ == "__main__":
    main()
