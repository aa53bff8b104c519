"""Data-parallel batched solving over a `jax.sharding.Mesh`.

The reference is a single-process shared-memory library (OpenMP over shooting
nodes; SURVEY §2.5).  The TPU-native replacement for "more parallelism" is
batch/data parallelism over problem instances: thousands of OCP instances
(initial states, cost references, gait parameters) sharded over the device
mesh, each solved by the same jitted FDDP program.  Only scalar metric
reductions cross devices, so this scales linearly over ICI/DCN.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
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
