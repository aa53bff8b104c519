"""Horizon-parallel Riccati backward pass via associative scan.

The reference's backward pass is a strict sequential recursion over the T
knots (ddp.cpp:195-252) — O(T) dependent small-matrix steps, which on a TPU
is latency-bound (each step is a handful of (ndx,ndx) matmuls + one (nu,nu)
Cholesky).  This module computes the SAME value functions with an
associative scan over affine-quadratic value-function maps
(Särkkä & García-Fernández, "Temporal Parallelization of Bayesian Smoothers",
IEEE TAC 2021, §V applied to LQT), giving O(log T) depth with batched
(T, ndx, ndx) element combines — the sequence-parallelism analogue for the
horizon axis (SURVEY §2.5/§5).

Element E_[k,l) maps the value function at knot l to the value function at
knot k:

    S_k = J + Aᵀ S_l (I + C S_l)⁻¹ A
    s_k = η + Aᵀ (I + S_l C)⁻¹ (s_l + S_l b)

Per-node initialization (control u eliminated through the node's own
Luu ≻ 0; ureg keeps it PD exactly like the reference's Quu regularization):

    A = Fx − Fu Luu⁻¹ Lxuᵀ        b = f_{k+1} − Fu Luu⁻¹ Lu
    C = Fu Luu⁻¹ Fuᵀ              η = Lx − Lxu Luu⁻¹ Lu
    J = Lxx − Lxu Luu⁻¹ Lxuᵀ

where f_{k+1} is the FDDP defect gap (the reference folds it in as
Vx += Vxx·f, ddp.cpp:242-244; here it is the affine drift b).  The terminal
element carries (J = Lxx_T + xreg·I, η = Lx_T + J·f_T).

State regularization: the reference adds xreg·I to every intermediate Vxx
(ddp.cpp:237-239).  Here xreg·I is folded into every node's Lxx, which
propagates identically through the suffix products (and is exact at
convergence where xreg → regmin ≈ 0).

After the suffix scan yields (S_{k+1}, s_{k+1}) for every knot in parallel,
the per-node gains K, k and Qu are recovered with one batched (vmapped)
pass — identical formulas to the sequential code path.

The element combines solve the nonsymmetric system (I + C·J) via LU
(`jnp.linalg.solve`); on TPU this restricts the parallel path to float32
(f64 LU is not lowered there) — the sequential scan path has no such limit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class _Elem(NamedTuple):
    A: jax.Array   # (..., n, n)
    b: jax.Array   # (..., n)
    C: jax.Array   # (..., n, n)
    eta: jax.Array  # (..., n)
    J: jax.Array   # (..., n, n)


def _combine(e_later: _Elem, e_earlier: _Elem) -> _Elem:
    """E_[i,l) = E_[i,j) ∘ E_[j,l) for e_earlier = E_[i,j), e_later = E_[j,l).

    Argument order matches `associative_scan` over the REVERSED element
    array (suffix products): the scan's left operand is the block closer to
    the terminal.  Formulas: Särkkä & García-Fernández 2021, Lemma 9, with
    the η-sign convention adapted to value functions.  The paper's lemma is
    stated for messages exp(−½xᵀJx + ηᵀx); our elements carry value
    functions V = ½xᵀJx + ηᵀx (η_msg = −η_val), which flips the sign of the
    two cross terms (C₁η₂ and J₂b₁) relative to the paper.
    """
    A1, b1, C1, eta1, J1 = e_earlier
    A2, b2, C2, eta2, J2 = e_later
    n = A1.shape[-1]
    eye = jnp.eye(n, dtype=A1.dtype)

    M = eye + C1 @ J2                       # (..., n, n), nonsymmetric
    A = A2 @ jnp.linalg.solve(M, A1)
    b = (A2 @ jnp.linalg.solve(
        M, (b1 - (C1 @ eta2[..., None])[..., 0])[..., None]))[..., 0] + b2
    C = A2 @ jnp.linalg.solve(M, C1) @ jnp.swapaxes(A2, -1, -2) + C2
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))

    N = eye + J2 @ C1                       # (..., n, n), nonsymmetric
    A1T = jnp.swapaxes(A1, -1, -2)
    rhs_eta = eta2 + (J2 @ b1[..., None])[..., 0]
    eta = (A1T @ jnp.linalg.solve(N, rhs_eta[..., None]))[..., 0] + eta1
    J = A1T @ jnp.linalg.solve(N, J2 @ A1) + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Elem(A, b, C, eta, J)


def _node_elements(derivs, fs_next, ureg):
    """Vectorized per-node element init; derivs leaves have leading T axis."""
    dt = derivs.Fx.dtype
    nu = derivs.Luu.shape[-1]
    Luu = derivs.Luu + ureg * jnp.eye(nu, dtype=dt)
    # Jacobi-equilibrated Cholesky (see fddp._backward_pass)
    dscale = jnp.sqrt(jnp.maximum(
        jnp.diagonal(Luu, axis1=-2, axis2=-1), 1e-30))
    Luu_eq = Luu / dscale[..., :, None] / dscale[..., None, :]
    chol = jnp.linalg.cholesky(Luu_eq)
    failed = jnp.isnan(chol).any()

    def lsolve(B):
        """Luu⁻¹ B for (..., nu, m) B."""
        y = jax.scipy.linalg.cho_solve((chol, True),
                                       B / dscale[..., :, None])
        return y / dscale[..., :, None]

    LuuinvLxuT = lsolve(jnp.swapaxes(derivs.Lxu, -1, -2))    # (T, nu, ndx)
    LuuinvLu = lsolve(derivs.Lu[..., None])                  # (T, nu, 1)
    LuuinvFuT = lsolve(jnp.swapaxes(derivs.Fu, -1, -2))      # (T, nu, ndx)

    A = derivs.Fx - derivs.Fu @ LuuinvLxuT
    b = fs_next - (derivs.Fu @ LuuinvLu)[..., 0]
    C = derivs.Fu @ LuuinvFuT
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    eta = derivs.Lx - (derivs.Lxu @ LuuinvLu)[..., 0]
    J = derivs.Lxx - derivs.Lxu @ LuuinvLxuT
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Elem(A, b, C, eta, J), failed


def backward_pass_parallel(derivs, dterm, fs, xreg, ureg):
    """Drop-in replacement for fddp._backward_pass (non-box path).

    Returns (Vx, Vxx, Qu, k, K, Quuk, failed) with identical semantics.
    """
    dt = fs.dtype
    T, ndx = fs.shape[0] - 1, fs.shape[-1]
    eye = jnp.eye(ndx, dtype=dt)

    # fold xreg into every node's Lxx (see module docstring) + terminal
    derivs_r = derivs.replace(Lxx=derivs.Lxx + xreg * eye)
    elems, failed0 = _node_elements(derivs_r, fs[1:], ureg)

    # terminal element WITHOUT its own gap — every knot's own gap f_k is
    # folded uniformly below (node k's gap f_{k+1} already enters node k's
    # element as the affine drift b)
    Vxx_T = dterm.Lxx + xreg * eye
    term = _Elem(A=jnp.zeros((1, ndx, ndx), dt),
                 b=jnp.zeros((1, ndx), dt),
                 C=jnp.zeros((1, ndx, ndx), dt),
                 eta=dterm.Lx[None], J=Vxx_T[None])

    all_elems = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)
    # suffix products: reverse → inclusive scan → reverse
    rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), all_elems)
    scanned = jax.lax.associative_scan(_combine, rev, axis=0)
    suffix = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), scanned)

    # V_k = (J, η) of E_[k, T]; stored Vx is gap-inclusive like the
    # sequential pass (Vx += Vxx·f, ddp.cpp:242-244)
    Vxx = suffix.J                                     # (T+1, ndx, ndx)
    Vx = suffix.eta + (Vxx @ fs[..., None])[..., 0]    # (T+1, ndx)

    # gains: batched recovery from V_{k+1} (same math as the sequential step)
    S_next = Vxx[1:]                     # (T, ndx, ndx)
    s_next = Vx[1:]                      # gap-inclusive Vx'
    FuT = jnp.swapaxes(derivs.Fu, -1, -2)
    Qu = derivs.Lu + (FuT @ s_next[..., None])[..., 0]
    Quu = derivs.Luu + FuT @ S_next @ derivs.Fu \
        + ureg * jnp.eye(derivs.Luu.shape[-1], dtype=dt)
    Qxu = derivs.Lxu + jnp.swapaxes(derivs.Fx, -1, -2) @ S_next @ derivs.Fu

    dscale = jnp.sqrt(jnp.maximum(
        jnp.diagonal(Quu, axis1=-2, axis2=-1), 1e-30))
    Quu_eq = Quu / dscale[..., :, None] / dscale[..., None, :]
    chol = jnp.linalg.cholesky(Quu_eq)
    # raiseIfNaN semantics (solver-base.cpp:175-178): NaN/inf/>=1e30 fails
    failed = (failed0 | jnp.isnan(chol).any()
              | ~(jnp.max(jnp.abs(Vx)) < 1e30)
              | ~(jnp.max(jnp.abs(Vxx)) < 1e30))

    def qsolve(B):
        y = jax.scipy.linalg.cho_solve((chol, True), B / dscale[..., :, None])
        return y / dscale[..., :, None]

    K = qsolve(jnp.swapaxes(Qxu, -1, -2))
    kvec = qsolve(Qu[..., None])[..., 0]
    Quuk = (Quu @ kvec[..., None])[..., 0]
    return Vx, Vxx, Qu, kvec, K, Quuk, failed
