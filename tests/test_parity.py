"""Precision-policy parity: float32 (TPU policy) vs float64 solves of the
same problems must agree to the north-star control-deviation budget.

This is the achievable proxy for "<1e-4 control deviation vs reference
Crocoddyl" (BASELINE.json): the reference runs f64 on CPU; our f64 CPU path
is oracle-validated (tests/oracle.py, numdiff suites), so f32-vs-f64
deviation bounds the precision-policy contribution to f32-vs-reference
deviation.  The policy: f32 bulk iterations to the f32 gradient floor,
then ct.polish — a 2-iteration f64 warm-started refinement (fddp.polish).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.action import replicate_model
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.models.unicycle import UnicycleModel


def _unicycle(dtype):
    m = UnicycleModel(dt=jnp.asarray(0.1, dtype),
                      cost_weights=jnp.asarray([10.0, 1.0], dtype))
    return ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0], dtype),
                           running=replicate_model(m, 20), terminal=m)


def _rel_dev(us_ref, us):
    us_ref = np.asarray(us_ref, np.float64)
    us = np.asarray(us, np.float64)
    return np.max(np.abs(us_ref - us)) / np.max(np.abs(us_ref))


def test_unicycle_f32_policy_meets_budget():
    s64 = ct.solve(_unicycle(jnp.float64),
                   settings=ct.SolverSettings(maxiter=100, th_stop=1e-9))
    s32 = ct.solve(_unicycle(jnp.float32),
                   settings=ct.SolverSettings(maxiter=100, th_stop=5e-5))
    assert bool(s64.converged) and bool(s32.converged)
    raw = _rel_dev(s64.us, s32.us)
    assert raw < 5e-4, f"raw f32 deviation {raw:.3e}"

    pol = ct.polish(_unicycle(jnp.float32), s32, iters=2)
    refined = _rel_dev(s64.us, pol.us)
    assert refined < 1e-4, f"polished deviation {refined:.3e}"
    assert refined < raw


@pytest.mark.slow
def test_anymal_walk_f32_vs_f64_controls():
    """Small ANYmal walking problem, f32 policy vs f64 oracle."""
    from benchmarks.parity_report import f32_vs_f64_deviation
    du, umax, rel, sols = f32_vs_f64_deviation(step_knots=4,
                                               support_knots=1)
    assert bool(sols["float64"].converged)
    assert rel < 1e-4, f"relative control deviation {rel:.3e}"
