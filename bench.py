"""Benchmark: batched FDDP solves/s on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North-star target (BASELINE.json): >=1000 batched FDDP solves/s on a 100-step
quadruped-gait problem; until the multibody stack lands this measures the
unicycle OCP (the reference's PR-1 anchor problem).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from crocoddyl_tpu.core.action import replicate_model
    from crocoddyl_tpu.core.problem import ShootingProblem
    from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
    from crocoddyl_tpu.models.unicycle import UnicycleModel

    T = 100
    B = 4096
    dtype = jnp.float32
    m = UnicycleModel(dt=jnp.asarray(0.1, dtype),
                      cost_weights=jnp.asarray([10.0, 1.0], dtype))
    prob = ShootingProblem(
        x0=jnp.zeros((3,), dtype),
        running=replicate_model(m, T), terminal=m)
    settings = SolverSettings(maxiter=10, record_trace=False, th_stop=1e-6)

    key = jax.random.PRNGKey(0)
    x0s = jax.random.uniform(key, (B, 3), dtype, minval=-2.0, maxval=2.0)

    @jax.jit
    def run(x0s):
        return jax.vmap(
            lambda x0: solve(prob.replace(x0=x0), settings=settings).cost
        )(x0s)

    # warmup/compile
    run(x0s).block_until_ready()

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run(x0s).block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep

    solves_per_s = B / dt
    print(json.dumps({
        "metric": "batched_fddp_unicycle_T100_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
