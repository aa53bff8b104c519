"""Data-parallel batched solving over a `jax.sharding.Mesh`.

The reference is a single-process shared-memory library (OpenMP over shooting
nodes; SURVEY §2.5) with no distributed backend.  The TPU-native replacement
(SURVEY §7 scale.mesh) is:

* **batch/data parallelism over problem instances** — thousands of OCP
  instances (initial states, cost references, gait parameters) sharded over
  the device mesh, each solved by the same jitted FDDP program.  No
  cross-device communication inside a solve, so this scales linearly over
  ICI and across hosts over DCN.
* **collective metric reductions** — fleet-level statistics (mean/max cost,
  convergence counts) via ``psum``-style collectives, the analogue of the
  reference's iteration-table diagnostics at fleet scale.

Multi-host usage: initialize ``jax.distributed``, build the mesh over
``jax.devices()`` (all hosts), and feed each host its local shard —
the same ``batched_solve_fn`` program runs SPMD on every host.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place a pytree whose leaves have a leading batch axis onto the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree on every device of the mesh (problem constants)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batched_solve_fn(solve_fn: Callable, mesh: Mesh, axis: str = "batch"):
    """Wrap a single-instance solve into a mesh-sharded batched solve.

    ``solve_fn(problem) -> Solution``; the returned function takes a problem
    pytree with a leading batch axis on every leaf and runs one solve per
    batch element, sharded over ``mesh``.
    """
    batched = jax.vmap(solve_fn)

    @jax.jit
    def run(problems):
        sharding = NamedSharding(mesh, P(axis))
        problems = jax.lax.with_sharding_constraint(problems, sharding)
        return batched(problems)

    return run


def sharded_solve_x0(solve_fn: Callable, problem, mesh: Mesh,
                     axis: str = "batch"):
    """Common case: one problem definition replicated, a batch of initial
    states sharded.  Returns ``run(x0s) -> Solution`` (leading batch axis),
    jitted with explicit in/out shardings so XLA lays out the batch over ICI.
    """
    batch_sh = NamedSharding(mesh, P(axis))

    @partial(jax.jit, in_shardings=(batch_sh,), out_shardings=batch_sh)
    def run(x0s):
        return jax.vmap(lambda x0: solve_fn(problem.replace(x0=x0)))(x0s)

    return run


def fleet_metrics(solution) -> dict:
    """Reduce a batched Solution to fleet statistics.  Inside jit over a
    sharded batch these lower to XLA collectives (psum/pmax over ICI)."""
    return {
        "mean_cost": jnp.mean(solution.cost),
        "max_cost": jnp.max(solution.cost),
        "mean_iters": jnp.mean(solution.iter.astype(jnp.float32)),
        "converged_frac": jnp.mean(solution.converged.astype(jnp.float32)),
        "diverged_frac": jnp.mean(solution.diverged.astype(jnp.float32)),
    }
