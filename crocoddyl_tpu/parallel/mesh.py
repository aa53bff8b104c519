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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> int:
    """Initialize the multi-host runtime (jax.distributed) and return this
    process's index.

    On TPU pods the arguments are auto-detected from the environment; on
    CPU/GPU clusters pass the coordinator ``host:port``, world size, and
    rank (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).  After this, ``jax.devices()`` spans every host and
    ``data_mesh()`` builds a global mesh — ``sharded_solve_x0`` then runs
    the same SPMD program on each host with its local shard
    (BASELINE.md §3 multi-host scaling point; smoke test:
    tests/test_mesh.py::test_multiprocess_cpu_mesh)."""
    import os
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (coordinator_address or
                                     os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = (num_processes if num_processes is not None
                               else int(os.environ["JAX_NUM_PROCESSES"]))
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = (process_id if process_id is not None
                            else int(os.environ["JAX_PROCESS_ID"]))
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)
    return jax.process_index()


def host_local_batch(global_batch: int, axis_size: Optional[int] = None):
    """Split a global batch size into this host's local slice
    (start, length) — feed ``sharded_solve_x0`` per-host shards with
    jax.make_array_from_process_local_data in multi-host runs."""
    n = jax.process_count() if axis_size is None else axis_size
    i = jax.process_index()
    per, rem = divmod(global_batch, n)
    # distribute the remainder over the first `rem` hosts so every problem
    # is assigned exactly once (a silent drop here would lose the last
    # global_batch % n problems)
    start = i * per + min(i, rem)
    return start, per + (1 if i < rem else 0)
