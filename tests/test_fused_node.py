"""Fused node-linearization kernel (ops/fused_node.py) vs the generic node
path.

Three layers of checks, mirroring the reference's numdiff-oracle strategy
(the generic path is itself pinned against finite differences in
test_multibody_nodes.py / test_contacts_numdiff.py):

1. lane-layout "jnp" mode == vmapped RigidBodyNode.calc_both (f64, tight);
2. pallas interpret mode == jnp mode (kernel semantics incl. the in-kernel
   atan2 replacement, block padding, const hoisting);
3. end-to-end: a full FDDP solve with the fused path forced on matches the
   generic solve's cost/controls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import crocoddyl_tpu as ct
from crocoddyl_tpu.apps.gaits import QuadrupedGaitFactory
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.ops import fused_node as fn


@pytest.fixture(scope="module")
def walk():
    m = robots.anymal(dtype=np.float64)
    q0 = robots.anymal_standing_q(m)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv)])
    fac = QuadrupedGaitFactory(
        m, ["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        default_q=np.asarray(q0))
    prob = fac.walking_problem(x0, 0.25, 0.15, 1e-2,
                               step_knots=3, support_knots=1)
    T = prob.T
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(x0[None], (T, 1)) + 0.01 * jax.random.normal(
        key, (T, x0.shape[0]))
    qn = xs[:, 3:7] / jnp.linalg.norm(xs[:, 3:7], axis=1, keepdims=True)
    xs = xs.at[:, 3:7].set(qn)
    us = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (T, prob.nu))
    return prob, xs, us


def _max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)


def test_supports_walking_node(walk):
    prob, _, _ = walk
    assert fn.supports(prob.segments[0])


def test_lane_jnp_matches_generic(walk):
    prob, xs, us = walk
    seg = prob.segments[0]
    ref = jax.jit(jax.vmap(lambda m, x, u: m.calc_both(x, u)))(seg, xs, us)
    out = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "jnp"))(seg, xs, us)
    for name in ("Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu"):
        rel = _max_rel(getattr(ref[0], name), getattr(out[0], name))
        assert rel < 1e-10, (name, rel)
    assert _max_rel(ref[1], out[1]) < 1e-12   # xnext
    assert _max_rel(ref[2], out[2]) < 1e-12   # cost


def test_pallas_interpret_matches_jnp(walk):
    prob, xs, us = walk
    seg = prob.segments[0]
    a = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "jnp"))(seg, xs, us)
    b = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "interpret"))(
        seg, xs, us)
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert _max_rel(pa, pb) < 1e-9


def test_pallas_interpret_under_vmap(walk):
    """The bench path vmaps solve over B: the kernel must batch."""
    prob, xs, us = walk
    seg = prob.segments[0]
    xsb = jnp.stack([xs, xs + 1e-3])
    usb = jnp.stack([us, us - 1e-3])
    vb = jax.jit(jax.vmap(
        lambda x, u: fn.calc_both_stacked(seg, x, u, "interpret")))(xsb, usb)
    vj = jax.jit(jax.vmap(
        lambda x, u: fn.calc_both_stacked(seg, x, u, "jnp")))(xsb, usb)
    for pa, pb in zip(jax.tree.leaves(vj), jax.tree.leaves(vb)):
        assert _max_rel(pa, pb) < 1e-9


def test_terminal_dt0_nodes(walk):
    """dt=0 knots (pseudo-impulse/terminal semantics): Fx=I, Fu=0 exactly."""
    prob, xs, us = walk
    seg = prob.segments[0]
    seg0 = seg.replace(dt=jnp.zeros_like(seg.dt))
    out = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "jnp"))(seg0, xs, us)
    T = xs.shape[0]
    ndx = prob.state.ndx
    np.testing.assert_allclose(
        np.asarray(out[0].Fx),
        np.broadcast_to(np.eye(ndx), (T, ndx, ndx)), atol=0)
    assert float(jnp.abs(out[0].Fu).max()) == 0.0
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(xs), atol=0)


def test_free_node_full_actuation():
    """Contact-free fixed-base node (FullActuation) through the fused path."""
    from crocoddyl_tpu.core.action import stack_models
    from crocoddyl_tpu.models.multibody.activations import ActivationQuad
    from crocoddyl_tpu.models.multibody.actuations import FullActuation
    from crocoddyl_tpu.models.multibody.costs import CostControl, CostState
    from crocoddyl_tpu.models.multibody.nodes import CostStack, RigidBodyNode
    from crocoddyl_tpu.dynamics.states import StateMultibody

    m = robots.arm7(dtype=np.float64)
    st = StateMultibody(model=m)
    xref = jnp.concatenate([m.neutral(), jnp.zeros(m.nv)])
    node = RigidBodyNode(
        state_=st,
        actuation=FullActuation(nv=m.nv),
        costs=CostStack(items=(
            CostState(xref=xref, activation=ActivationQuad(),
                      weight=jnp.asarray(1.0), active=jnp.asarray(1.0)),
            CostControl(uref=jnp.zeros(m.nv), activation=ActivationQuad(),
                        weight=jnp.asarray(0.1), active=jnp.asarray(1.0)),
        )),
        contacts=None,
        dt=jnp.asarray(0.02))
    seg = stack_models([node] * 5)
    assert fn.supports(seg)
    key = jax.random.PRNGKey(2)
    xs = 0.3 * jax.random.normal(key, (5, st.nx))
    us = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (5, m.nv))
    ref = jax.jit(jax.vmap(lambda mm, x, u: mm.calc_both(x, u)))(seg, xs, us)
    out = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "jnp"))(seg, xs, us)
    for pa, pb in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        assert _max_rel(pa, pb) < 1e-10
    itp = jax.jit(
        lambda s, x, u: fn.calc_both_stacked(s, x, u, "interpret"))(
        seg, xs, us)
    for pa, pb in zip(jax.tree.leaves(out), jax.tree.leaves(itp)):
        assert _max_rel(pa, pb) < 1e-9


def test_solve_with_fused_path(walk):
    """End-to-end FDDP with the fused calc_diff forced on (jnp mode)."""
    prob, _, _ = walk
    xs0 = jnp.tile(prob.x0[None], (prob.T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    settings = ct.SolverSettings(maxiter=40)
    base = ct.solve(prob, xs_init=xs0, us_init=us0, settings=settings)
    fn.set_fused_mode("jnp")
    try:
        fused = ct.solve(prob, xs_init=xs0, us_init=us0, settings=settings)
    finally:
        fn.set_fused_mode(None)
    assert bool(fused.converged) == bool(base.converged)
    assert abs(float(fused.cost) - float(base.cost)) < 1e-6 * (
        1.0 + abs(float(base.cost)))
    assert _max_rel(base.us, fused.us) < 1e-6
