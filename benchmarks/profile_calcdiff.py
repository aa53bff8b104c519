"""Ablation micro-profile of the calc_diff hot path on the benchmark problem.

Times, at bench shapes (B x T batched), the pieces of the per-node
linearization so optimization effort lands on the actual hot op:
  kin_primal    — KinData sweep + M + b (no AD)
  dyn_primal    — full _dynamics (adds contact KKT)
  node_primal   — full _compute (adds residuals + integrate)
  jac_kin       — jacfwd of (M, b) wrt dx            [ndx tangents]
  jac_dyn       — jacfwd of a wrt (dx, du)           [ndx+nu tangents]
  jac_node      — the real _tangent_outputs          [the calc_diff core]

Run: python benchmarks/profile_calcdiff.py  (BENCH_B to set batch)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import quadruped_problem  # noqa: E402


def main():
    B = int(os.environ.get("BENCH_B", "128"))
    dtype = jnp.float32
    prob, x0 = quadruped_problem(dtype)
    T = prob.T
    st = prob.state

    xs = jnp.tile(x0[None], (B, T, 1))
    key = jax.random.PRNGKey(0)
    xs = xs + 0.01 * jax.random.normal(key, xs.shape, dtype)
    us = 0.1 * jax.random.normal(key, (B, T, prob.nu), dtype)

    # one representative running node: pick the LONGEST segment (the swing
    # phase, 100 of 108 knots: 3 active contacts + swing-foot tracking) —
    # profiling the 2-knot double-support segment would misattribute the
    # calc_diff time.  PROFILE_SEG=support selects the first segment instead.
    def _len(s):
        return jax.tree.leaves(s)[0].shape[0]
    if os.environ.get("PROFILE_SEG", "swing") == "support":
        seg = prob.segments[0]
    else:
        seg = max(prob.segments, key=_len)
    m0 = jax.tree.map(lambda a: a[0] if hasattr(a, "ndim") and a.ndim and
                      a.shape[0] == _len(seg) else a, seg)

    def kin_primal(x, u):
        from crocoddyl_tpu.dynamics import algorithms as algo
        q, v = x[:st.nq], x[st.nq:]
        kin = algo.KinCache(st.model, q, v)
        return kin.mass_matrix(m0.armature).sum() + kin.bias_forces().sum()

    def dyn_primal(x, u):
        a, _ = m0._dynamics(x, u)
        return a.sum()

    def node_primal(x, u):
        xn, c, R = m0._compute(x, u)
        return xn.sum() + c + R.sum()

    def jac_kin(x, u):
        def f(dx):
            xi = st.integrate(x, dx)
            return kin_primal(xi, u)
        return jax.jacfwd(f)(jnp.zeros((st.ndx,), dtype)).sum()

    def jac_dyn(x, u):
        def f(dx, du):
            xi = st.integrate(x, dx)
            a, _ = m0._dynamics(xi, u + du)
            return a
        da, du_ = jax.jacfwd(f, argnums=(0, 1))(
            jnp.zeros((st.ndx,), dtype), jnp.zeros((m0.nu,), dtype))
        return da.sum() + du_.sum()

    def jac_node(x, u):
        out = m0._tangent_outputs(x, u)
        return sum(jnp.sum(o) for o in out)

    results = {}
    for name, fn in [("kin_primal", kin_primal), ("dyn_primal", dyn_primal),
                     ("node_primal", node_primal), ("jac_kin", jac_kin),
                     ("jac_dyn", jac_dyn), ("jac_node", jac_node)]:
        g = jax.jit(jax.vmap(jax.vmap(fn)))
        try:
            r = g(xs, us)
            r.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                g(xs, us).block_until_ready()
            ms = (time.perf_counter() - t0) / 3 * 1e3
            results[name] = round(ms, 2)
            print(f"{name:14s} {ms:9.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:14s} FAILED: {e}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
