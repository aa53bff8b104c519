"""Rigid-body OCP nodes: the reference's DAM + integrator stacks as single
fused action models.

- :class:`RigidBodyNode` = {free | contact} forward dynamics + cost sum +
  semi-implicit Euler (or RK4) integration.  Covers the reference's
  DifferentialActionModelFreeFwdDynamics (free-fwddyn.hxx:62-114),
  DifferentialActionModelContactFwdDynamics (contact-fwddyn.hxx:59-159) and
  IntegratedActionModelEuler (euler.hxx:41-131, incl. the dt=0
  terminal/pseudo-impulse behavior).
- :class:`ImpulseNode` = ActionModelImpulseFwdDynamics
  (impulse-fwddyn.hxx:57-137).

Derivatives: dynamics Jacobians (Fx, Fu) come from ONE forward-mode AD pass
through the whole fused node in tangent coordinates — mathematically the
analytic KKT/ABA derivative chain of the reference, produced by the same
linear-solve adjoints.  Cost Hessians use the reference's Gauss-Newton
convention: residual Jacobians (from the same AD pass) contracted with
activation (Ar, Arr) — NOT full AD Hessians — so iteration behavior matches
crocoddyl.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...core.action import ActionModel, NodeDerivs
from ...dynamics import algorithms as algo
from ...dynamics.states import StateMultibody
from .actuations import Actuation
from ...ops import smallchol as _sc
from .contacts import (ContactSet, _contact_kkt_raw, pd_solve,
                       solve_contact_kkt)
from .costs import Cost, cost_nr


class NodeCache:
    """Per-node computed data handed to cost residuals (the reference's
    DataCollector* composition, multibody/data/*.hpp)."""

    def __init__(self, kin: algo.KinCache, forces=None, vnext=None, tau=None,
                 a=None):
        self.kin = kin
        self.model = kin.model
        self.q, self.v = kin.q, kin.v
        self.oMi, self.vels = kin.oMi, kin.vels
        self.forces = forces or []
        self.vnext = vnext
        self.tau = tau
        self.a = a

    def frame_placement(self, fid):
        return self.kin.frame_placement(fid)

    def frame_velocity(self, fid):
        return self.kin.frame_velocity(fid)

    def frame_bias_acc(self, fid):
        return self.kin.frame_bias_acc(fid)

    def frame_jacobian_local(self, fid):
        return self.kin.frame_jacobian_local(fid)

    def contact_force(self, idx):
        return self.forces[idx]


class CostStack(struct.PyTreeNode):
    """Weighted sum of residual costs (multibody/costs/cost-sum.hxx)."""

    items: Tuple = struct.field(default_factory=tuple)

    def residuals(self, st, cache, x, u):
        if not self.items:
            return jnp.zeros((0,), x.dtype)
        return jnp.concatenate(
            [c.residual(st, cache, x, u) for c in self.items])

    def slices(self, st):
        out, i = [], 0
        for c in self.items:
            n = cost_nr(c, st)
            out.append((i, n))
            i += n
        return out

    def value(self, st, R):
        """Total cost from the stacked residual vector."""
        total = jnp.zeros((), R.dtype)
        for c, (i, n) in zip(self.items, self.slices(st)):
            a, _, _ = c.activation.calc(R[i:i + n])
            total = total + c.active * c.weight * a
        return total

    def gauss_newton(self, st, R, Rx, Ru):
        """Assemble (Lx, Lu, Lxx, Lxu, Luu) GN-style (cost-base pattern)."""
        ndx, nu = Rx.shape[-1], Ru.shape[-1]
        dt = R.dtype
        Lx = jnp.zeros((ndx,), dt)
        Lu = jnp.zeros((nu,), dt)
        Lxx = jnp.zeros((ndx, ndx), dt)
        Lxu = jnp.zeros((ndx, nu), dt)
        Luu = jnp.zeros((nu, nu), dt)
        for c, (i, n) in zip(self.items, self.slices(st)):
            _, Ar, Arr = c.activation.calc(R[i:i + n])
            w = c.active * c.weight
            rx, ru = Rx[i:i + n], Ru[i:i + n]
            Lx = Lx + w * (rx.T @ Ar)
            Lu = Lu + w * (ru.T @ Ar)
            rxw = rx * Arr[:, None]
            Lxx = Lxx + w * (rx.T @ rxw)
            Lxu = Lxu + w * (rx.T @ (ru * Arr[:, None]))
            Luu = Luu + w * (ru.T @ (ru * Arr[:, None]))
        return Lx, Lu, Lxx, Lxu, Luu


class RigidBodyNode(ActionModel):
    """Fused {free|contact} dynamics + costs + Euler/RK4 node."""

    state_: StateMultibody
    actuation: Actuation
    costs: CostStack
    contacts: Optional[ContactSet] = None
    dt: jax.Array = None
    armature: Optional[jax.Array] = None
    kkt_damping: float = struct.field(pytree_node=False, default=0.0)
    integrator: str = struct.field(pytree_node=False, default="euler")

    @property
    def state(self) -> StateMultibody:
        return self.state_

    @property
    def nu(self) -> int:
        return self.actuation.nu

    # ------------------------------------------------------------------
    def _dynamics(self, x, u):
        """Continuous dynamics: returns (a (nv,), cache)."""
        st = self.state_
        m = st.model
        q, v = x[:st.nq], x[st.nq:]
        tau = self.actuation.calc(x, u)
        kin = algo.KinCache(m, q, v)
        # one shared kinematic sweep feeds M, b, contacts and costs
        M = kin.mass_matrix(self.armature)
        b = kin.bias_forces()
        if self.contacts is not None and self.contacts.contacts:
            cache = NodeCache(kin, tau=tau)
            Jc, a0, mask = self.contacts.calc(cache)
            a, lam, _ = solve_contact_kkt(M, Jc, a0, tau - b, mask,
                                          self.kkt_damping)
            forces = [lam[i:i + c.nc]
                      for (i, _), c in zip(self.contacts.slices(),
                                           self.contacts.contacts)]
            cache.forces = forces
            cache.a = a
            return a, cache
        a = pd_solve(M, tau - b)
        cache = NodeCache(kin, tau=tau, a=a)
        return a, cache

    def _compute(self, x, u):
        """(xnext, cost, R): one fused evaluation of the discrete node."""
        st = self.state_
        nv = st.nv
        a, cache = self._dynamics(x, u)
        R = self.costs.residuals(st, cache, x, u)
        cost_rate = self.costs.value(st, R)
        v = x[st.nq:]

        dt = self.dt
        if self.integrator == "euler":
            dx = jnp.concatenate([v * dt + a * dt * dt, a * dt])
            xnext_int = st.integrate(x, dx)
        else:  # rk4 on (q, v) with frozen u
            def f(xs):
                a_s, _ = self._dynamics(xs, u)
                vs = xs[st.nq:]
                return jnp.concatenate([vs, a_s])
            k1 = f(x)
            k2 = f(st.integrate(x, 0.5 * dt * k1))
            k3 = f(st.integrate(x, 0.5 * dt * k2))
            k4 = f(st.integrate(x, dt * k3))
            dx = dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            xnext_int = st.integrate(x, dx)

        # dt=0 ⇒ terminal / pseudo-impulse node (euler.hxx:64-74)
        is_terminal = dt == 0.0
        xnext = jnp.where(is_terminal, x, xnext_int)
        cost = jnp.where(is_terminal, cost_rate, dt * cost_rate)
        return xnext, cost, R

    def calc(self, x, u):
        xnext, cost, _ = self._compute(x, u)
        return xnext, cost

    def calc_terminal(self, x):
        u = jnp.zeros((self.nu,), x.dtype)
        _, cache = self._dynamics(x, u)
        R = self.costs.residuals(self.state_, cache, x, u)
        return self.costs.value(self.state_, R)

    # ------------------------------------------------------------------
    def _tangent_outputs(self, x, u):
        """(Fx, Fu, R, Rx, Ru) — analytic-structure forward linearization.

        Mirrors the reference's derivative chain (euler.hxx:83-131 over
        contact-fwddyn.hxx:107-159) rather than AD over the fused node:

        1. The kinematic sweep is linearized ONCE (``jax.linearize``,
           ndx tangents) into :class:`~..dynamics.algorithms.KinArrays`.
        2. The dynamics tangents come from the KKT differential at the
           primal solution: only the contracted VECTORS d(M·a), db,
           d(Jcᵀ)·λ, d(Jc)·a, da0 are formed (the reference's
           computeRNEADerivatives + getKKTContactDynamicMatrixInverse
           path) and all ndx+nu directions are back-substituted through
           the primal Cholesky factorizations in one multi-RHS solve —
           dM/dJc are never materialized and the factorizations are never
           differentiated.
        3. Residual Jacobians = sweep-tangent contractions + the force
           chain term (∂R/∂λ)·dλ (the reference's df_dx/df_du coupling).
        4. Closed-form Euler chain rule through the manifold retraction:
           xnext = x ⊕ dstep with dstep = [v·dt + a·dt²; a·dt], so
           Fx = Jint_x + Jint_dx · d(dstep)/ddx with the closed-form
           free-flyer Jintegrate blocks (states.py) — AD never sees
           integrate/diff/quaternions on the output side.

        Contract: cost residuals may depend on x, u, the kinematic sweep
        outputs and the contact forces — not on ``cache.a``/``cache.tau``
        (true of the whole cost zoo, as in the reference's DataCollector
        wiring).  The dt=0 terminal/pseudo-impulse node (xnext = x) gives
        Fx = I, Fu = 0 exactly (euler.hxx:64-74).
        """
        st = self.state_
        nv, ndx, nu = st.nv, st.ndx, self.nu
        dtt = x.dtype

        if self.integrator != "euler":
            # generic fused-AD path (RK4): one jacfwd, primal via aux
            xnext0, cost0, _ = self._compute(x, u)

            def g(dx, du):
                xn, _, R = self._compute(st.integrate(x, dx), u + du)
                return (st.diff(xnext0, xn), R), R

            z_dx = jnp.zeros((ndx,), dtt)
            z_du = jnp.zeros((nu,), dtt)
            ((Fx, Fu), (Rx, Ru)), R0 = jax.jacfwd(
                g, argnums=(0, 1), has_aux=True)(z_dx, z_du)
            return Fx, Fu, R0, Rx, Ru, xnext0, cost0

        z_dx = jnp.zeros((ndx,), dtt)
        z_du = jnp.zeros((nu,), dtt)
        m = st.model

        # ---- primal sweep at the linearization point.  The tangent path
        # is CLOSED FORM throughout (gforce_derivatives for the dynamics,
        # frame_tangents for contacts and frame costs) — the generic
        # sweep-linearization basis (kin_tangent_basis) is built only if
        # some cost lacks a residual_jac_x closed form.
        xi0 = st.integrate(x, z_dx)
        kin0 = algo.KinData(m, xi0[:st.nq], xi0[st.nq:])

        # ---- primal dynamics at the linearization point ------------------
        tau0 = self.actuation.calc(xi0, u)
        M = kin0.mass_matrix(self.armature)
        b = kin0.bias_forces()
        has_contacts = self.contacts is not None and self.contacts.contacts
        if has_contacts:
            cache0 = NodeCache(kin0, tau=tau0)
            Jc, a0v, mask = self.contacts.calc(cache0)
            a, lam, Lm, Ls, MinvJT = _contact_kkt_raw(
                M, Jc, a0v, tau0 - b, mask, self.kkt_damping)
            forces0 = [lam[i:i + c.nc]
                       for (i, _), c in zip(self.contacts.slices(),
                                            self.contacts.contacts)]
            cache0.forces = forces0
            nc = Jc.shape[0]
        else:
            Lm = _sc.chol(M)
            a = _sc.cho_solve(Lm, tau0 - b)
            lam = jnp.zeros((0,), dtt)
            forces0 = []
            cache0 = NodeCache(kin0, tau=tau0)
            nc = 0
        cache0.a = a

        # ---- x-tangents of the dynamics vector r1 = τ − M·a − b + Jcᵀλ:
        # CLOSED FORM (algorithms.gforce_derivatives, GEMM-shaped — the
        # reference's computeRNEADerivatives role).  The contact term
        # enters as fixed world wrenches attached to the contact bodies
        # (λ held constant, frames moving rigidly with their bodies).
        if has_contacts:
            ext_w = jnp.zeros((m.njoints, 6), dtt)
            for (i0c, _), c in zip(self.contacts.slices(),
                                   self.contacts.contacts):
                lam_c = lam[i0c:i0c + c.nc]
                wrench = (jnp.concatenate([lam_c, jnp.zeros((3,), dtt)])
                          if c.nc == 3 else lam_c)
                w_w = cache0.frame_placement(c.fid).act_force(wrench)
                ext_w = ext_w.at[m.frame_parents[c.fid]].add(w_w)
        else:
            ext_w = None
        dG_dq, dG_dv = algo.gforce_derivatives(kin0, a, ext_w)
        dtau_dx = jax.jacfwd(
            lambda dx: self.actuation.calc(st.integrate(x, dx), u))(z_dx)
        dr1_dx = dtau_dx - jnp.concatenate([dG_dq, dG_dv], axis=1)

        # ---- x-tangents of the contact vector r2 = −(Jc·a + a0):
        # CLOSED FORM per frame (algorithms.frame_tangents +
        # Contact{3D,6D}.calc_tangent) — the contact stack no longer reads
        # the sweep-tangent basis, whose Jacobian-column tower was the
        # dominant tangent cost.
        if has_contacts:
            r2x = self.contacts.calc_tangents(kin0, cache0, a)  # (ndx, nc)
        else:
            r2x = jnp.zeros((ndx, 0), dtt)

        # ---- residual-stack tangents: closed form per cost
        # (Cost.residual_jac_x, the reference's per-cost calcDiff split);
        # any cost without a closed form falls back to the generic
        # sweep-linearization of the WHOLE stack.
        fts = {}

        def ft_of(fid):
            if fid not in fts:
                fts[fid] = algo.frame_tangents(kin0, a, fid)
            return fts[fid]

        R = self.costs.residuals(st, cache0, xi0, u)
        nr = R.shape[0]
        jac_rows = [c.residual_jac_x(st, cache0, xi0, u, ft_of)
                    for c in self.costs.items]
        if all(j is not None for j in jac_rows):
            Rx_kin = (jnp.concatenate(jac_rows, axis=0).T if jac_rows
                      else jnp.zeros((ndx, 0), dtt))
        else:
            ka0 = kin0.arrays()
            dka_all = algo.kin_tangent_basis(kin0)    # leading (ndx,) axis
            dxi_all = jnp.transpose(
                jax.jacfwd(lambda dx: st.integrate(x, dx))(z_dx))

            def h_x(ka, xi):
                kin = algo.KinData.from_arrays(m, xi[:st.nq], xi[st.nq:], ka)
                cache = NodeCache(kin, forces=forces0, tau=None, a=a)
                return self.costs.residuals(st, cache, xi, u)

            _, h_lin = jax.linearize(h_x, ka0, xi0)
            Rx_kin = jax.vmap(h_lin)(dka_all, dxi_all)

        # ---- u-tangents: no kinematic dependence --------------------------
        def h_u(du):
            ui = u + du
            tau = self.actuation.calc(xi0, ui)
            cache = NodeCache(kin0, forces=forces0, tau=None, a=a)
            Rv = self.costs.residuals(st, cache, xi0, ui)
            return tau, Rv

        dtau_du, Ru_kin = jax.jacfwd(h_u)(z_du)   # (nv, nu), (nr, nu)

        # ---- back-substitute all ndx+nu tangent directions at once --------
        r1_all = jnp.concatenate([dr1_dx, dtau_du], axis=1)  # (nv, ndx+nu)
        if has_contacts:
            r2_all = jnp.concatenate(
                [r2x.T, jnp.zeros((nc, nu), dtt)], axis=1)
            Minv_r1 = _sc.cho_solve(Lm, r1_all)
            dlam = _sc.cho_solve(Ls, (r2_all - Jc @ Minv_r1) * mask[:, None])
            dacc = Minv_r1 + MinvJT @ dlam
        else:
            dacc = _sc.cho_solve(Lm, r1_all)
            dlam = jnp.zeros((0, ndx + nu), dtt)
        da_dx, da_du = dacc[:, :ndx], dacc[:, ndx:]

        # ---- residual force-dependence: dR += (∂R/∂λ)·dλ -------------------
        Rx = Rx_kin.T if nr else jnp.zeros((0, ndx), dtt)
        Ru = Ru_kin
        if has_contacts and nr:
            def h_f(lam_v):
                fs = [lam_v[i:i + c.nc]
                      for (i, _), c in zip(self.contacts.slices(),
                                           self.contacts.contacts)]
                cache = NodeCache(kin0, forces=fs, tau=None, a=a)
                return self.costs.residuals(st, cache, xi0, u)

            Rf = jax.jacfwd(h_f)(lam)             # (nr, nc)
            Rx = Rx + Rf @ dlam[:, :ndx]
            Ru = Ru + Rf @ dlam[:, ndx:]

        v = x[st.nq:]
        dt = self.dt
        dstep = jnp.concatenate([v * dt + a * dt * dt, a * dt])
        Jx, Jdx = st.jintegrate(x, dstep)

        # d(dstep)/ddx: dv/ddx = [0 I] exactly (integrate adds dv linearly)
        dv_ddx = jnp.concatenate(
            [jnp.zeros((nv, nv), dtt), jnp.eye(nv, dtype=dtt)], axis=1)
        dstep_dx = jnp.concatenate(
            [dt * dv_ddx + dt * dt * da_dx, dt * da_dx], axis=0)
        dstep_du = jnp.concatenate([dt * dt * da_du, dt * da_du], axis=0)
        Fx_int = Jx + Jdx @ dstep_dx
        Fu_int = Jdx @ dstep_du

        is_term = dt == 0.0
        Fx = jnp.where(is_term, jnp.eye(ndx, dtype=dtt), Fx_int)
        Fu = jnp.where(is_term, jnp.zeros((ndx, nu), dtt), Fu_int)

        # primal (xnext, cost) for free — shares the fused evaluation
        # (ShootingProblem::calc + calcDiff in one pass)
        xnext = jnp.where(is_term, x, st.integrate(x, dstep))
        cost_rate = self.costs.value(st, R)
        cost = jnp.where(is_term, cost_rate, dt * cost_rate)
        return Fx, Fu, R, Rx, Ru, xnext, cost

    def calc_diff(self, x, u) -> NodeDerivs:
        return self.calc_both(x, u)[0]

    def calc_both(self, x, u):
        """(NodeDerivs, xnext, cost) in ONE fused evaluation — the solver's
        calcDiff also needs calc's outputs for the gaps (ddp.cpp:157-178),
        and both share the same dynamics pass."""
        st = self.state_
        Fx, Fu, R, Rx, Ru, xnext, cost = self._tangent_outputs(x, u)
        Lx, Lu, Lxx, Lxu, Luu = self.costs.gauss_newton(st, R, Rx, Ru)
        scale = jnp.where(self.dt == 0.0, 1.0, self.dt)
        return (NodeDerivs(Fx=Fx, Fu=Fu, Lx=scale * Lx, Lu=scale * Lu,
                           Lxx=scale * Lxx, Lxu=scale * Lxu, Luu=scale * Luu),
                xnext, cost)

    def calc_diff_terminal(self, x) -> NodeDerivs:
        st = self.state_
        u = jnp.zeros((self.nu,), x.dtype)

        def r_of(dx):
            xi = st.integrate(x, dx)
            _, cache = self._dynamics(xi, u)
            return self.costs.residuals(st, cache, xi, u)

        z = jnp.zeros((st.ndx,), x.dtype)
        Rx = jax.jacfwd(r_of)(z)
        R = r_of(z)
        Ru = jnp.zeros((R.shape[0], self.nu), x.dtype)
        Lx, Lu, Lxx, Lxu, Luu = self.costs.gauss_newton(st, R, Rx, Ru)
        dt_ = x.dtype
        return NodeDerivs(Fx=jnp.eye(st.ndx, dtype=dt_),
                          Fu=jnp.zeros((st.ndx, self.nu), dt_),
                          Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu)

    def quasi_static(self, x, maxiter: int = 10):
        """Torques balancing gravity/contacts at rest (quasiStatic;
        free-fwddyn.hxx:137-169): least-squares τ(u) = b(q, 0)."""
        st = self.state_
        m = st.model
        q = x[:st.nq]
        v0 = jnp.zeros((st.nv,), x.dtype)
        b = algo.rnea(m, q, v0, jnp.zeros((st.nv,), x.dtype))
        # dtau_du at u=0
        u0 = jnp.zeros((self.nu,), x.dtype)
        dtau_du = jax.jacfwd(lambda uu: self.actuation.calc(x, uu))(u0)
        def ls_solve(A, rhs):
            # least squares via Cholesky'd normal equations (TPU-friendly;
            # lstsq would lower to SVD).  Wide systems (contact case: columns
            # for inactive contacts are exactly zero, so AtA is singular) use
            # the min-norm dual form x = Aᵀ(AAᵀ)⁻¹rhs whose (nv,nv) Gram
            # matrix is full rank.  Regularization is dtype-scaled: a fixed
            # 1e-9 vanishes in float32.
            eps = 1e-9 if A.dtype == jnp.float64 else 1e-5
            if A.shape[0] < A.shape[1]:       # wide: min-norm dual
                G = A @ A.T
                lam = eps * (jnp.trace(G) / G.shape[0] + 1.0)
                L = jnp.linalg.cholesky(G + lam * jnp.eye(G.shape[0],
                                                          dtype=A.dtype))
                return A.T @ jax.scipy.linalg.cho_solve((L, True), rhs)
            G = A.T @ A
            lam = eps * (jnp.trace(G) / G.shape[0] + 1.0)
            L = jnp.linalg.cholesky(G + lam * jnp.eye(G.shape[0],
                                                      dtype=A.dtype))
            return jax.scipy.linalg.cho_solve((L, True), A.T @ rhs)

        if self.contacts is not None and self.contacts.contacts:
            kin = algo.KinCache(m, q, v0)
            cache = NodeCache(kin)
            Jc, a0, mask = self.contacts.calc(cache)
            A = jnp.concatenate([dtau_du, Jc.T], axis=1)
            return ls_solve(A, b)[:self.nu]
        return ls_solve(dtau_du, b)


class ImpulseNode(ActionModel):
    """Discrete impact node (impulse-fwddyn.hxx:57-137): solves
    [M Jᵀ; J 0][v⁺; −Λ] = [M v⁻; −e·J·v⁻]; xnext = (q, v⁺); nu controls are
    ignored (Fu = 0, matching the reference's nu=0 semantics under a
    uniform-nu problem)."""

    state_: StateMultibody
    impulses: ContactSet
    costs: CostStack
    nu_: int = struct.field(pytree_node=False, default=0)
    r_coeff: jax.Array = None     # restitution (default 0)
    kkt_damping: float = struct.field(pytree_node=False, default=0.0)

    @property
    def state(self) -> StateMultibody:
        return self.state_

    @property
    def nu(self) -> int:
        return self.nu_

    def _compute(self, x):
        st = self.state_
        m = st.model
        q, v = x[:st.nq], x[st.nq:]
        kin = algo.KinCache(m, q, v)
        cache = NodeCache(kin)
        Jc, mask = self.impulses.calc_impulse(cache)
        M = kin.mass_matrix()
        e = self.r_coeff if self.r_coeff is not None else jnp.zeros((), x.dtype)
        nc = Jc.shape[0]
        dt = x.dtype
        # Schur-complement Cholesky solve of the impulse KKT (TPU-friendly;
        # see contacts.solve_contact_kkt):  S Λ = −(1+e)·J v⁻ with
        # S = J M⁻¹ Jᵀ + damping·I, then v⁺ = v⁻ + M⁻¹ Jᵀ Λ.
        Lm = _sc.chol(M)
        MinvJT = _sc.cho_solve(Lm, Jc.T)
        S = Jc @ MinvJT + self.kkt_damping * jnp.eye(nc, dtype=dt)
        S = S * (mask[:, None] * mask[None, :]) + jnp.diag(1.0 - mask)
        b_lam = -(1.0 + e) * (Jc @ v) * mask
        Ls = _sc.chol(S)
        Lam = _sc.cho_solve(Ls, b_lam)
        vnext = v + MinvJT @ Lam
        forces = [Lam[i:i + c.nc]
                  for (i, _), c in zip(self.impulses.slices(),
                                       self.impulses.contacts)]
        cache.forces = forces
        cache.vnext = vnext
        xnext = jnp.concatenate([q, vnext])
        R = self.costs.residuals(st, cache, x, jnp.zeros((self.nu_,), dt))
        cost = self.costs.value(st, R)
        return xnext, cost, R

    def calc(self, x, u):
        xnext, cost, _ = self._compute(x)
        return xnext, cost

    def calc_terminal(self, x):
        return self._compute(x)[1]

    def calc_diff(self, x, u) -> NodeDerivs:
        return self.calc_both(x, u)[0]

    def calc_both(self, x, u):
        st = self.state_
        xnext0, cost0, _ = self._compute(x)

        def g(dx):
            xn, _, R = self._compute(st.integrate(x, dx))
            return (st.diff(xnext0, xn), R), R

        z = jnp.zeros((st.ndx,), x.dtype)
        (Fx, Rx), R0 = jax.jacfwd(g, has_aux=True)(z)
        nu = self.nu_
        Ru = jnp.zeros((R0.shape[0], nu), x.dtype)
        Lx, Lu, Lxx, Lxu, Luu = self.costs.gauss_newton(st, R0, Rx, Ru)
        return (NodeDerivs(Fx=Fx, Fu=jnp.zeros((st.ndx, nu), x.dtype),
                           Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu),
                xnext0, cost0)

    def calc_diff_terminal(self, x) -> NodeDerivs:
        return self.calc_diff(x, jnp.zeros((self.nu_,), x.dtype))
