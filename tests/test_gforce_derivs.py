"""Closed-form generalized-force derivatives (algorithms.gforce_derivatives)
pinned against jax.linearize of the kinematic sweep (the reference's
computeRNEADerivatives role, contact-fwddyn.hxx:126-147)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crocoddyl_tpu.dynamics import algorithms as algo
from crocoddyl_tpu.dynamics import robots
from crocoddyl_tpu.dynamics.states import StateMultibody


def _G_fn(model, a, ext_local):
    """G(q, v) = M·a + b − Jᵀ·ext with BODY-ATTACHED external wrenches
    (ext given in each joint's local frame, like contact forces — the
    world wrench oMi·ext moves with the body, matching the node's
    Jc(q)ᵀλ term with λ fixed)."""

    def G(q, v):
        kin = algo.KinData(model, q, v)
        return kin.mass_matrix_vec(a) + kin.bias_forces(
            fext_local=ext_local)

    return G


@pytest.mark.parametrize("robot,ext", [
    ("quadruped", False), ("quadruped", True),
    ("arm7", False), ("biped", True),
], ids=["quad", "quad_ext", "arm", "biped_ext"])
def test_gforce_derivatives_vs_ad(robot, ext):
    m = getattr(robots, robot)()
    st = StateMultibody(m)
    key = jax.random.PRNGKey(11)
    q = m.random_q(key)
    v = 0.4 * jax.random.normal(jax.random.PRNGKey(12), (m.nv,))
    a = 0.7 * jax.random.normal(jax.random.PRNGKey(13), (m.nv,))
    ext_local = (0.5 * jax.random.normal(jax.random.PRNGKey(14),
                                         (m.njoints, 6)) if ext else None)
    x = jnp.concatenate([q, v])

    G = _G_fn(m, a, ext_local)

    # AD oracle: tangent derivative through state.integrate (matches the
    # local free-flyer convention of the closed form)
    def G_of_dx(dx):
        xi = st.integrate(x, dx)
        return G(xi[: st.nq], xi[st.nq:])

    J = jax.jacfwd(G_of_dx)(jnp.zeros((st.ndx,)))     # (nv, ndx)
    dG_dq_ad, dG_dv_ad = J[:, : m.nv], J[:, m.nv:]

    kin = algo.KinData(m, q, v)
    ext_w = (kin.oMi.act_force(ext_local) if ext_local is not None
             else None)
    dG_dq, dG_dv = algo.gforce_derivatives(kin, a, ext_w)

    scale = 1 + np.abs(np.asarray(dG_dq_ad)).max()
    np.testing.assert_allclose(np.asarray(dG_dq), np.asarray(dG_dq_ad),
                               atol=1e-8 * scale)
    scale_v = 1 + np.abs(np.asarray(dG_dv_ad)).max()
    np.testing.assert_allclose(np.asarray(dG_dv), np.asarray(dG_dv_ad),
                               atol=1e-8 * scale_v)
