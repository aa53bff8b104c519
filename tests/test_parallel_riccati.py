"""Horizon-parallel Riccati (associative scan) vs the sequential backward
pass: identical value functions, gains and feedforwards (the parallel form
is an exact reformulation, not an approximation).

Also checks that FDDP with ``parallel_riccati=True`` reproduces the
sequential solver's trajectory on the unicycle anchor problem.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import crocoddyl_tpu as ct
from crocoddyl_tpu.core.action import NodeDerivs, replicate_model
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers import fddp
from crocoddyl_tpu.core.solvers.parallel_riccati import backward_pass_parallel
from crocoddyl_tpu.models.unicycle import UnicycleModel


def _random_derivs(key, T, ndx, nu):
    ks = jax.random.split(key, 8)
    Fx = (jnp.eye(ndx) + 0.1 * jax.random.normal(ks[0], (T, ndx, ndx)))
    Fu = 0.3 * jax.random.normal(ks[1], (T, ndx, nu))
    Lx = jax.random.normal(ks[2], (T, ndx))
    Lu = jax.random.normal(ks[3], (T, nu))
    A = jax.random.normal(ks[4], (T, ndx, ndx))
    Lxx = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(ndx)
    B = jax.random.normal(ks[5], (T, nu, nu))
    Luu = B @ jnp.swapaxes(B, -1, -2) + 1.0 * jnp.eye(nu)
    Lxu = 0.1 * jax.random.normal(ks[6], (T, ndx, nu))
    derivs = NodeDerivs(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu,
                        Luu=Luu)
    At = jax.random.normal(ks[7], (ndx, ndx))
    dterm = NodeDerivs(Fx=jnp.eye(ndx), Fu=jnp.zeros((ndx, nu)),
                       Lx=jnp.ones((ndx,)),
                       Lu=jnp.zeros((nu,)),
                       Lxx=At @ At.T + jnp.eye(ndx),
                       Lxu=jnp.zeros((ndx, nu)),
                       Luu=jnp.zeros((nu, nu)))
    return derivs, dterm


@pytest.mark.parametrize("with_gaps", [False, True])
def test_parallel_matches_sequential(with_gaps):
    T, ndx, nu = 23, 7, 3
    key = jax.random.PRNGKey(0)
    derivs, dterm = _random_derivs(key, T, ndx, nu)
    fs = (0.1 * jax.random.normal(jax.random.PRNGKey(9), (T + 1, ndx))
          if with_gaps else jnp.zeros((T + 1, ndx)))
    xreg = jnp.asarray(0.0)
    ureg = jnp.asarray(1e-9)

    seq = fddp._backward_pass(derivs, dterm, fs, xreg, ureg)
    par = backward_pass_parallel(derivs, dterm, fs, xreg, ureg)

    names = ("Vx", "Vxx", "Qu", "k", "K", "Quuk")
    for n, a, b in zip(names, seq[:-1], par[:-1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-8, err_msg=n)
    assert not bool(par[-1])


def test_parallel_matches_sequential_with_xreg():
    """xreg folds into every node's Lxx; identical to the sequential pass
    (which adds xreg to every intermediate Vxx, ddp.cpp:237-239)."""
    T, ndx, nu = 11, 5, 2
    derivs, dterm = _random_derivs(jax.random.PRNGKey(3), T, ndx, nu)
    fs = jnp.zeros((T + 1, ndx))
    xreg = jnp.asarray(1e-3)
    ureg = jnp.asarray(1e-3)
    seq = fddp._backward_pass(derivs, dterm, fs, xreg, ureg)
    par = backward_pass_parallel(derivs, dterm, fs, xreg, ureg)
    for n, a, b in zip(("Vx", "Vxx", "Qu", "k", "K"), seq[:5], par[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-7, err_msg=n)


def test_fddp_with_parallel_riccati_unicycle():
    m = UnicycleModel()
    prob = ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=replicate_model(m, 20), terminal=m)
    sol_seq = ct.solve(prob, settings=ct.SolverSettings(
        maxiter=50, record_trace=False))
    sol_par = ct.solve(prob, settings=ct.SolverSettings(
        maxiter=50, record_trace=False, parallel_riccati=True))
    assert bool(sol_par.converged)
    # same anchor solution (True 9 249.5608979... on the verify recipe)
    np.testing.assert_allclose(float(sol_par.cost), float(sol_seq.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_par.us),
                               np.asarray(sol_seq.us), atol=1e-6)
