"""AOT / export round-trip tests (utils/aot.py — the codegen analogue of the
reference's ActionModelCodeGen, core/codegen/action-base.hpp: record a model's
calc/calcDiff once, reuse the compiled artifact)."""

import jax
import jax.numpy as jnp
import numpy as np

import crocoddyl_tpu as ct
from crocoddyl_tpu.models.unicycle import UnicycleModel
from crocoddyl_tpu.utils import aot


def _solve_cost(x0):
    m = UnicycleModel()
    prob = ct.ShootingProblem(x0=x0, running=ct.replicate_model(m, 10),
                              terminal=m)
    return ct.solve(prob, settings=ct.SolverSettings(
        maxiter=20, record_trace=False)).cost


def test_precompile_executes():
    x0 = jnp.asarray([-1.0, -1.0, 1.0])
    compiled = aot.precompile(_solve_cost, x0)
    c1 = compiled(x0)
    c2 = jax.jit(_solve_cost)(x0)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-12)


def test_export_import_roundtrip():
    """StableHLO serialization round-trip: exported bytes re-import to a
    callable producing identical results (the deployable-artifact path)."""
    x0 = jnp.asarray([0.5, -0.2, 0.3])
    f = lambda x: _solve_cost(x) * 2.0
    data = aot.export_bytes(f, x0)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 100
    g = aot.import_bytes(data)
    np.testing.assert_allclose(float(g(x0)), float(jax.jit(f)(x0)),
                               rtol=1e-12)
