"""Worker for the 2-process CPU mesh smoke test (spawned by
tests/test_mesh.py::test_multiprocess_cpu_mesh).

Each process contributes 2 virtual CPU devices; the global mesh spans 4.
Solves a sharded unicycle batch and prints the global mean cost.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    from crocoddyl_tpu.parallel import mesh as pmesh

    pid = pmesh.init_distributed(f"localhost:{port}", num_processes=2,
                                 process_id=rank)
    assert pid == rank
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
    from crocoddyl_tpu.models.unicycle import UnicycleModel
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = UnicycleModel()
    prob = ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=replicate_model(m, 20), terminal=m)
    B = 8
    mesh = pmesh.data_mesh()
    settings = SolverSettings(maxiter=30, record_trace=False)
    run = pmesh.sharded_solve_x0(lambda p: solve(p, settings=settings),
                                 prob, mesh)

    # deterministic global batch; each process feeds its local shard
    x0s_global = (np.asarray([-1.0, -1.0, 1.0])[None]
                  + 0.1 * np.arange(B)[:, None] * np.asarray([1.0, -1.0, 0.5]))
    sharding = NamedSharding(mesh, P("batch"))
    x0s = jax.make_array_from_process_local_data(
        sharding, x0s_global[rank * (B // 2):(rank + 1) * (B // 2)], (B, 3))
    sol = run(x0s)
    mean_cost = float(jnp.mean(sol.cost))  # global collective reduce
    conv = int(jnp.sum(sol.converged.astype(jnp.int32)))
    print(f"RESULT rank={rank} mean_cost={mean_cost:.10f} converged={conv}",
          flush=True)


if __name__ == "__main__":
    main()
