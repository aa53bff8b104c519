"""Probe: does dot_general under vmap(vmap(jacfwd(...))) still trip the XLA
simplification-pass verifier bug that forced lie.mm/mv into
broadcast-multiply-reduce form?  (PERF_NOTES item 3.)

Runs three shapes of the mass-matrix contraction M = J^T blockdiag(I) J at
bench-like batch dims and prints OK/FAIL per variant:
  bmr      — current broadcast-multiply-reduce form
  einsum   — einsum with the stacked batch dims left to XLA
  flat_dot — reshape to ONE flattened batch dim, dot_general, reshape back

Usage: python benchmarks/probe_dotgeneral.py  (PROBE_B/PROBE_T to resize)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

B = int(os.environ.get("PROBE_B", "16"))
T = int(os.environ.get("PROBE_T", "27"))
NJ, NV = 13, 18
DT = jnp.float32


def make_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, T, NV), DT)
    Jbase = jax.random.normal(k2, (NJ, 6, NV), DT)
    Ibase = jax.random.normal(k3, (NJ, 6, 6), DT)
    return q, Jbase, Ibase


def kin(q, Jbase, Ibase):
    """Toy 'sweep': q-dependent J and I (so jacfwd has something to push)."""
    s = jnp.sin(q).sum() * 0.01
    return Jbase * (1.0 + s), Ibase * (1.0 - s)


def m_bmr(J, I):
    T1 = (J[:, :, None, :] * I[:, :, :, None]).sum(1)
    return (T1[:, :, :, None] * J[:, :, None, :]).sum((0, 1))


def m_einsum(J, I):
    return jnp.einsum("kav,kab,kbw->vw", J, I, J)


def m_flatdot(J, I):
    Jf = J.reshape(NJ * 6, NV)
    # blockdiag(I) @ J as batched (NJ) matmul then one (NJ*6, NV)^T x (NJ*6, NV)
    IJ = jax.lax.dot_general(I, J, (((2,), (1,)), ((0,), (0,))))  # (NJ, 6, NV)
    return jax.lax.dot_general(Jf, IJ.reshape(NJ * 6, NV),
                               (((0,), (0,)), ((), ())))


def run(name, mfn):
    q, Jb, Ib = make_inputs()

    def node(qi):
        J, I = kin(qi, Jb, Ib)
        M = mfn(J, I)
        return M.sum(-1)  # (NV,) vector output

    def per_node(qi):
        return jax.jacfwd(node)(qi).sum()

    f = jax.jit(jax.vmap(jax.vmap(per_node)))
    try:
        r = f(q)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            f(q).block_until_ready()
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name:10s} OK    {ms:8.2f} ms  sum={float(r.sum()):.4e}",
              flush=True)
    except Exception as e:
        print(f"{name:10s} FAIL  {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    for name, fn in [("bmr", m_bmr), ("einsum", m_einsum),
                     ("flat_dot", m_flatdot)]:
        run(name, fn)
