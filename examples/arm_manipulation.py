"""Arm reaching task (reference: examples/arm_manipulation.py — Talos arm
reaching a goal with DDP; golden log examples/log/arm_manipulation.log)."""

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
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody
from crocoddyl_tpu.models.multibody.activations import ActivationQuad
from crocoddyl_tpu.models.multibody.actuations import FullActuation
from crocoddyl_tpu.models.multibody.costs import (
    CostControl, CostFramePlacement, CostState,
)
from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode


def make_problem(T=250, dt=1e-3, target=(0.0, 0.0, 0.4)):
    """Mirrors the reference recipe exactly (examples/arm_manipulation.py:
    gripperPose w=1 running+terminal, xReg/uReg w=1e-4, dt=1e-3, T=250,
    armature 0.1 on the first six joints)."""
    m = robots.arm7()
    st = StateMultibody(model=m)
    fid = m.frame_id("gripper")
    q0 = jnp.asarray(np.array([0.5, 0.6, -0.8, 1.2, 0.4, 0.3, 0.0]))
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    armature = jnp.asarray([0.1] * 6 + [0.0])

    def node(w_goal, dt_):
        costs = CostStack(items=(
            CostFramePlacement(fid=fid, ref_R=jnp.eye(3),
                               ref_p=jnp.asarray(np.asarray(target)),
                               activation=ActivationQuad(),
                               weight=jnp.asarray(w_goal),
                               active=jnp.asarray(1.0)),
            CostState(xref=jnp.concatenate([q0, jnp.zeros(m.nv)]),
                      activation=ActivationQuad(),
                      weight=jnp.asarray(1e-4), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(m.nv), activation=ActivationQuad(),
                        weight=jnp.asarray(1e-4), active=jnp.asarray(1.0)),
        ))
        return RigidBodyNode(state_=st, actuation=FullActuation(nv=m.nv),
                             costs=costs, contacts=None, armature=armature,
                             dt=jnp.asarray(dt_))

    running = ct.stack_models([node(1.0, dt)] * T)
    terminal = node(1.0, 0.0)
    return ct.ShootingProblem(x0=x0, running=running, terminal=terminal), fid, m


def main():
    problem, fid, m = make_problem()
    sol = ct.solve(problem, settings=ct.ddp_settings(maxiter=100))
    ct.print_trace(sol, "arm_manipulation")
    from crocoddyl_tpu.dynamics import algorithms as algo
    qT = sol.xs[-1][:m.nq]
    oMi, _ = algo.forward_kinematics(m, qT)
    print("final gripper pos:", np.asarray(algo.frame_placement(m, oMi, fid).p))
    return sol


if __name__ == "__main__":
    main()
