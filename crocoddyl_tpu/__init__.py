"""crocoddyl_tpu — a TPU-native trajectory-optimization (DDP/FDDP) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Crocoddyl
(contact-RObot COntrol by Differential DYnamic programming): manifold states,
action models, shooting problems, DDP-family solvers with feedback gains,
rigid-body dynamics with contacts/impulses, cost libraries, gait factories,
and batched multi-device solving over a `jax.sharding.Mesh`.
"""

from .core.manifolds import StateBase, StateVector, state_vector
from .core.action import ActionModel, NodeDerivs, stack_models, replicate_model
from .core.problem import ShootingProblem
from .core.mpc import circular_append, shift_warm_start
from .core.solvers.fddp import (
    SolverSettings, Solution, Trace, solve, polish, ddp_settings,
    fddp_settings, box_ddp_settings, box_fddp_settings,
)
from .core.solvers import boxqp, kkt
from .core.solvers.fddp_batch import solve_batch
from .ops.fused_node import set_fused_mode
from .utils.casting import cast_floats
from .utils.callbacks import (
    print_trace, format_trace, SolverLog, save_solution, load_solution,
    plot_oc_solution, plot_convergence,
)

__version__ = "0.1.0"
