"""MPC horizon rotation + receding-horizon replanning.

Reference: ShootingProblem::circularAppend (core/optctrl/shooting.hpp:112-129)
and the warm-start/setCandidate mechanism (solver-base.hpp:126-137).  The
oracle is a Python list rebuild of the rotated node sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.core.action import replicate_model
from crocoddyl_tpu.core.mpc import (circular_append, rotate_segmented,
                                    shift_warm_start, stack_nodes)
from crocoddyl_tpu.core.problem import ShootingProblem
from crocoddyl_tpu.core.solvers.fddp import SolverSettings, solve
from crocoddyl_tpu.models.unicycle import UnicycleModel


def _varied_problem(T=12):
    """Unicycle horizon whose per-node parameters differ (so rotation is
    observable): cost weights ramp along the horizon."""
    m = UnicycleModel()
    stacked = replicate_model(m, T)
    w = jnp.stack([jnp.linspace(1.0, 2.0, T), jnp.linspace(0.1, 0.5, T)], -1)
    stacked = stacked.replace(cost_weights=w)
    return ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=stacked, terminal=m)


def _unstack(model):
    T = jax.tree.leaves(model)[0].shape[0]
    return [jax.tree.map(lambda l: l[t], model) for t in range(T)]


def _oracle_rotate(problem, k=1):
    """List-rebuild oracle: drop the first k nodes, append them at the tail
    (the reference's pointer rotation)."""
    nodes = []
    for seg in problem.segments:
        nodes.extend(_unstack(seg))
    nodes = nodes[k:] + nodes[:k]
    return nodes


def test_circular_append_matches_list_oracle():
    prob = _varied_problem()
    rotated = circular_append(prob)
    expect = _oracle_rotate(prob, 1)
    got = _unstack(rotated.running)
    for g, e in zip(got, expect):
        for lg, le in zip(jax.tree.leaves(g), jax.tree.leaves(e)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(le))


def test_circular_append_new_model_and_x0():
    prob = _varied_problem()
    new_node = jax.tree.map(lambda l: l[3] * 7.0, prob.running)
    x_new = jnp.asarray([0.5, 0.5, 0.0])
    rotated = circular_append(prob, new_model=new_node, new_x0=x_new)
    got = _unstack(rotated.running)
    for lg, le in zip(jax.tree.leaves(got[-1]), jax.tree.leaves(new_node)):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(le))
    np.testing.assert_allclose(np.asarray(rotated.x0), np.asarray(x_new))


def test_circular_append_rejects_segmented():
    prob = _varied_problem()
    seg_prob = prob.replace(running=(
        jax.tree.map(lambda l: l[:5], prob.running),
        jax.tree.map(lambda l: l[5:], prob.running)))
    with pytest.raises(ValueError, match="rotate_segmented"):
        circular_append(seg_prob)


def test_rotate_segmented_whole_horizon():
    """Rotation must cross segment boundaries: with segments [A(5), B(7)],
    one rotation puts node A0 at the global tail — adjacent to the B run."""
    prob = _varied_problem()
    segA = jax.tree.map(lambda l: l[:5], prob.running)
    segB = jax.tree.map(lambda l: l[5:], prob.running)
    seg_prob = prob.replace(running=(segA, segB))

    rotated = rotate_segmented(seg_prob, k=1)
    expect = _oracle_rotate(seg_prob, 1)
    got = []
    for seg in rotated.segments:
        got.extend(_unstack(seg))
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        for lg, le in zip(jax.tree.leaves(g), jax.tree.leaves(e)):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(le))
    # both segments share one pytree structure, so the regroup coalesces
    # the whole rotated horizon into a single stacked segment
    assert rotated.seg_lengths == (12,)


def test_rotate_segmented_k_matches_repeated_single():
    prob = _varied_problem()
    seg_prob = prob.replace(running=(
        jax.tree.map(lambda l: l[:5], prob.running),
        jax.tree.map(lambda l: l[5:], prob.running)))
    r3 = rotate_segmented(seg_prob, k=3)
    r111 = rotate_segmented(rotate_segmented(rotate_segmented(seg_prob)))
    a = [l for seg in r3.segments for l in jax.tree.leaves(seg)]
    b = [l for seg in r111.segments for l in jax.tree.leaves(seg)]
    # compare as flat node lists (segment grouping may differ in boundary)
    ga = [n for seg in r3.segments for n in _unstack(seg)]
    gb = [n for seg in r111.segments for n in _unstack(seg)]
    for x, y in zip(ga, gb):
        for lx, ly in zip(jax.tree.leaves(x), jax.tree.leaves(y)):
            np.testing.assert_allclose(np.asarray(lx), np.asarray(ly))


def test_shift_warm_start():
    xs = jnp.arange(12.0).reshape(6, 2)
    us = jnp.arange(5.0).reshape(5, 1)
    xm = jnp.asarray([100.0, 101.0])
    xs_n, us_n = shift_warm_start(xs, us, xm)
    np.testing.assert_allclose(np.asarray(xs_n[0]), np.asarray(xm))
    np.testing.assert_allclose(np.asarray(xs_n[1]), np.asarray(xs[2]))
    np.testing.assert_allclose(np.asarray(xs_n[-1]), np.asarray(xs[-1]))
    np.testing.assert_allclose(np.asarray(us_n[0]), np.asarray(us[1]))
    np.testing.assert_allclose(np.asarray(us_n[-1]), np.asarray(us[-1]))


def test_receding_horizon_loop_converges_fast():
    """A full MPC loop: solve, apply u0, rotate horizon + shift warm start,
    re-solve.  Warm-started replans must accept alpha=1 immediately (iter
    small) and drive the unicycle toward the origin."""
    T = 20
    m = UnicycleModel()
    prob = ShootingProblem(x0=jnp.asarray([-1.0, -1.0, 1.0]),
                           running=replicate_model(m, T), terminal=m)
    settings = SolverSettings(maxiter=50, record_trace=False)
    sol = solve(prob, settings=settings)
    assert bool(sol.converged)

    replan_settings = SolverSettings(maxiter=3, record_trace=False)

    @jax.jit
    def replan_step(prob, xs, us):
        # plant step: apply u0 from the current plan
        x_next, _ = jax.tree.map(lambda l: l[0], prob.running).calc(
            prob.x0, us[0])
        prob2 = circular_append(prob, new_x0=x_next)
        xs2, us2 = shift_warm_start(xs, us, x_next)
        s = solve(prob2, xs_init=xs2, us_init=us2, settings=replan_settings)
        return prob2, s

    xs, us = sol.xs, sol.us
    for _ in range(8):
        prob, s = replan_step(prob, xs, us)
        xs, us = s.xs, s.us
        assert not bool(s.diverged)
    # after 8 applied steps of a converged plan the state has contracted
    assert float(jnp.linalg.norm(prob.x0[:2])) < float(
        jnp.linalg.norm(jnp.asarray([-1.0, -1.0])))


def test_ms_chunk_requires_fddp():
    prob = _varied_problem()
    with pytest.raises(ValueError, match="feasibility_driven"):
        solve(prob, settings=SolverSettings(
            maxiter=2, ms_chunk=4, feasibility_driven=False))
