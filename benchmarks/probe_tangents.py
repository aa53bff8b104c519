"""Split the node-linearization cost (nodes._tangent_outputs) into stages:

  primal      - one fused node evaluation (calc)
  basis       - kin_tangent_basis alone (closed-form sweep tangents)
  r1r2        - basis + h_lin applied to the DYNAMICS vectors only (r1, r2)
  resid       - basis + h_lin applied to the RESIDUAL stack only
  full        - calc_both (everything incl. KKT back-substitution + GN)

Decides where the GEMM-reformulation effort goes.
Usage: python -m benchmarks.probe_tangents [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def _time(fn, args, trials=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from bench import quadruped_problem
    from crocoddyl_tpu.dynamics import algorithms as algo
    from crocoddyl_tpu.models.multibody.nodes import NodeCache
    from crocoddyl_tpu.models.multibody.contacts import _contact_kkt_raw
    from crocoddyl_tpu.ops import smallchol as _sc

    dtype = jnp.float32
    with jax.default_device(jax.devices("cpu")[0]):
        prob, x0 = quadruped_problem(dtype)
    T = prob.T
    B = args.batch
    st = prob.state
    node = prob.segments[0]          # stacked RigidBodyNode (T, ...)

    xs0 = jnp.tile(prob.x0[None], (T + 1, 1))
    us0 = jax.jit(prob.quasi_static)(xs0)
    xs_b = jnp.tile(xs0[None], (B, 1, 1))[:, :-1]     # (B, T, nx)
    us_b = jnp.tile(us0[None], (B, 1, 1))             # (B, T, nu)

    nodes_b = jax.tree.map(lambda l: jnp.broadcast_to(l[None], (B,) + l.shape),
                           node)

    def over_nodes(fn):
        return jax.jit(jax.vmap(jax.vmap(fn)))

    # ---- primal
    primal = over_nodes(lambda m, x, u: m.calc(x, u))

    # ---- basis only
    def basis_fn(m, x, u):
        kin = algo.KinData(m.state_.model, x[: st.nq], x[st.nq:])
        dka = algo.kin_tangent_basis(kin)
        # materialize real outputs — a scalar sum lets XLA DCE the stage
        return dka.vels, dka.biasacc, dka.Jcols

    basis = over_nodes(basis_fn)

    # ---- basis + dynamics-vector tangents (r1, r2), KKT solve included
    def r1r2_fn(m, x, u):
        stt = m.state_
        mm_ = stt.model
        ndx = stt.ndx
        z_dx = jnp.zeros((ndx,), x.dtype)
        xi0 = stt.integrate(x, z_dx)
        kin0 = algo.KinData(mm_, xi0[: stt.nq], xi0[stt.nq:])
        ka0 = kin0.arrays()
        dka = algo.kin_tangent_basis(kin0)
        dxi = jnp.transpose(jax.jacfwd(lambda dx: stt.integrate(x, dx))(z_dx))
        tau0 = m.actuation.calc(xi0, u)
        M = kin0.mass_matrix(m.armature)
        b = kin0.bias_forces()
        cache0 = NodeCache(kin0, tau=tau0)
        Jc, a0v, mask = m.contacts.calc(cache0)
        a, lam, Lm, Ls, MinvJT = _contact_kkt_raw(M, Jc, a0v, tau0 - b,
                                                  mask, m.kkt_damping)

        def h_x(ka, xi):
            kin = algo.KinData.from_arrays(mm_, xi[: stt.nq], xi[stt.nq:], ka)
            cache = NodeCache(kin, forces=None, tau=None, a=a)
            tau = m.actuation.calc(xi, u)
            Jc_t, a0_t, _ = m.contacts.calc(cache)
            r1 = tau - kin.mass_matrix_vec(a) - kin.bias_forces() \
                + Jc_t.T @ lam
            r2 = -(Jc_t @ a + a0_t)
            return r1, r2

        _, h_lin = jax.linearize(h_x, ka0, xi0)
        r1x, r2x = jax.vmap(h_lin)(dka, dxi)
        r1_all = r1x.T
        Minv_r1 = _sc.cho_solve(Lm, r1_all)
        dlam = _sc.cho_solve(Ls, (r2x.T - Jc @ Minv_r1) * mask[:, None])
        dacc = Minv_r1 + MinvJT @ dlam
        return dacc, dlam

    r1r2 = over_nodes(r1r2_fn)

    # ---- basis + residual tangents only
    def resid_fn(m, x, u):
        stt = m.state_
        mm_ = stt.model
        ndx = stt.ndx
        z_dx = jnp.zeros((ndx,), x.dtype)
        xi0 = stt.integrate(x, z_dx)
        kin0 = algo.KinData(mm_, xi0[: stt.nq], xi0[stt.nq:])
        ka0 = kin0.arrays()
        dka = algo.kin_tangent_basis(kin0)
        dxi = jnp.transpose(jax.jacfwd(lambda dx: stt.integrate(x, dx))(z_dx))
        tau0 = m.actuation.calc(xi0, u)
        M = kin0.mass_matrix(m.armature)
        b = kin0.bias_forces()
        cache0 = NodeCache(kin0, tau=tau0)
        Jc, a0v, mask = m.contacts.calc(cache0)
        a, lam, Lm, Ls, MinvJT = _contact_kkt_raw(M, Jc, a0v, tau0 - b,
                                                  mask, m.kkt_damping)
        forces0 = [lam[i:i + c.nc]
                   for (i, _), c in zip(m.contacts.slices(),
                                        m.contacts.contacts)]

        def h_x(ka, xi):
            kin = algo.KinData.from_arrays(mm_, xi[: stt.nq], xi[stt.nq:], ka)
            cache = NodeCache(kin, forces=forces0, tau=None, a=a)
            return m.costs.residuals(stt, cache, xi, u)

        _, h_lin = jax.linearize(h_x, ka0, xi0)
        Rx = jax.vmap(h_lin)(dka, dxi)
        return Rx

    resid = over_nodes(resid_fn)

    # ---- full calc_both
    full = over_nodes(lambda m, x, u: m.calc_both(x, u)[0])

    for name, fn in (("primal", primal), ("basis", basis),
                     ("basis+r1r2+kkt", r1r2), ("basis+resid", resid),
                     ("full calc_both", full)):
        ms = _time(fn, (nodes_b, xs_b, us_b))
        print(f"{name:>16}: {ms:8.2f} ms  (BxT={B}x{T})")


if __name__ == "__main__":
    main()
