"""Multi-device data-parallel tests on the 8-virtual-CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

The reference has no distributed tier (SURVEY §4: N/A); the TPU-native
equivalent asserted here is: sharded batched solve ≡ unsharded batched solve
(bitwise-deterministic data parallelism over the mesh), fleet_metrics
reductions under sharding, and linear-ish device scaling of the batch axis.
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.models.unicycle import UnicycleModel
from crocoddyl_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def prob():
    m = UnicycleModel()
    return ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=ct.replicate_model(m, 20), terminal=m)


@pytest.fixture(scope="module")
def x0s():
    key = jax.random.PRNGKey(0)
    return jnp.asarray([-1.0, -1.0, 1.0]) + 0.1 * jax.random.normal(
        key, (16, 3))


def _solve_fn(settings=None):
    settings = settings or ct.SolverSettings(maxiter=40, record_trace=False)
    return lambda p: ct.solve(p, settings=settings)


def test_devices_available():
    assert jax.device_count() >= 8, jax.devices()


def test_sharded_equals_unsharded(prob, x0s):
    """Same program, same math: mesh-sharded batch == single-device batch."""
    mesh = pmesh.data_mesh(8)
    run = pmesh.sharded_solve_x0(_solve_fn(), prob, mesh)
    sol_sharded = run(x0s)

    sol_plain = jax.jit(jax.vmap(
        lambda x0: _solve_fn()(prob.replace(x0=x0))))(x0s)

    np.testing.assert_allclose(np.asarray(sol_sharded.cost),
                               np.asarray(sol_plain.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_sharded.us),
                               np.asarray(sol_plain.us), atol=1e-10)
    assert np.array_equal(np.asarray(sol_sharded.iter),
                          np.asarray(sol_plain.iter))


def test_solution_sharding_layout(prob, x0s):
    """Outputs stay sharded over the batch axis (no implicit gather)."""
    mesh = pmesh.data_mesh(8)
    run = pmesh.sharded_solve_x0(_solve_fn(), prob, mesh)
    sol = run(x0s)
    sh = sol.us.sharding
    assert not sh.is_fully_replicated
    # every device holds a 16/8 = 2-element shard of the batch
    assert sh.shard_shape(sol.us.shape)[0] == 2


def test_fleet_metrics_under_sharding(prob, x0s):
    """fleet_metrics reduces a sharded Solution inside jit (collectives)."""
    mesh = pmesh.data_mesh(8)
    solve = _solve_fn()

    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sh = NamedSharding(mesh, P("batch"))

    @jax.jit
    def run(x0s):
        sol = jax.vmap(lambda x0: solve(prob.replace(x0=x0)))(
            jax.lax.with_sharding_constraint(x0s, batch_sh))
        return pmesh.fleet_metrics(sol)

    metrics = run(x0s)
    assert float(metrics["converged_frac"]) == 1.0
    assert float(metrics["diverged_frac"]) == 0.0
    assert np.isfinite(float(metrics["mean_cost"]))
    assert float(metrics["max_cost"]) >= float(metrics["mean_cost"])


def test_shard_batch_and_replicate_helpers(prob, x0s):
    mesh = pmesh.data_mesh(8)
    xs = pmesh.shard_batch(x0s, mesh)
    assert not xs.sharding.is_fully_replicated
    pr = pmesh.replicate(prob, mesh)
    assert jax.tree.leaves(pr)[0].sharding.is_fully_replicated


def test_batched_solve_fn_wrapper(prob, x0s):
    mesh = pmesh.data_mesh(8)
    solve = _solve_fn()
    run = pmesh.batched_solve_fn(lambda p: solve(p).cost, mesh)
    probs = jax.vmap(lambda x0: prob.replace(x0=x0))(x0s)
    costs = run(probs)
    assert costs.shape == (16,)
    assert np.all(np.isfinite(np.asarray(costs)))


def test_multiprocess_cpu_mesh():
    """Multi-host execution path smoke test: 2 OS processes, each with 2
    virtual CPU devices, form one 4-device global mesh via
    jax.distributed (parallel/mesh.py init_distributed) and solve a
    sharded batch; both ranks must agree on the collective mean cost
    (BASELINE.md §3 >=2-hosts scaling point, run as processes)."""
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_mesh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if "xla_force_host_platform" not in v.lower()
           or k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(env, JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache"))
        for rank in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
    results = {}
    for out in outs:
        m = re.search(r"RESULT rank=(\d) mean_cost=([\d.eE+-]+) "
                      r"converged=(\d+)", out)
        assert m, out[-2000:]
        results[int(m.group(1))] = (float(m.group(2)), int(m.group(3)))
    assert set(results) == {0, 1}
    # both ranks see the same global reduction; all 8 solves converged
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-12)
    assert results[0][1] == 8
