"""Plain-NumPy DDP/FDDP oracle for cross-validating the JAX solvers.

Independent reimplementation of the algorithm (sequential line search with
early exit, exception-style failure handling) used the same way the reference
uses its pure-Python "Derived" classes as a binding-equivalence oracle
(reference pattern: unittest/bindings/test_solvers.py).  Written from the
algorithm description — not a translation of any reference file.
"""

from __future__ import annotations

import numpy as np


class NumpyOracleSolver:
    def __init__(self, model_calc, model_calc_diff, term_calc, term_calc_diff,
                 x0, T, nx, nu,
                 diff=None, integrate=None,
                 feasibility_driven=True,
                 th_acceptstep=0.1, th_stop=1e-9, th_grad=1e-12,
                 th_stepdec=0.5, th_stepinc=0.01, th_acceptnegstep=2.0,
                 regfactor=10.0, regmin=1e-9, regmax=1e9, n_alphas=10):
        # model_calc(t, x, u) -> (xnext, cost); model_calc_diff(t, x, u) -> dict
        self.calc = model_calc
        self.calc_diff = model_calc_diff
        self.term_calc = term_calc
        self.term_calc_diff = term_calc_diff
        self.x0 = np.asarray(x0, dtype=float)
        self.T, self.nx, self.nu = T, nx, nu
        self.ndx = nx
        self.diff = diff or (lambda a, b: b - a)
        self.integrate = integrate or (lambda x, dx: x + dx)
        self.fd = feasibility_driven
        self.th_acceptstep = th_acceptstep
        self.th_stop = th_stop
        self.th_grad = th_grad
        self.th_stepdec = th_stepdec
        self.th_stepinc = th_stepinc
        self.th_acceptnegstep = th_acceptnegstep
        self.regfactor, self.regmin, self.regmax = regfactor, regmin, regmax
        self.alphas = [2.0 ** (-n) for n in range(n_alphas)]
        self.trace = []

    # -- pieces ----------------------------------------------------------
    def _calc_diff(self):
        self.datas = []
        cost = 0.0
        for t in range(self.T):
            xn, c = self.calc(t, self.xs[t], self.us[t])
            d = self.calc_diff(t, self.xs[t], self.us[t])
            d["xnext"] = xn
            self.datas.append(d)
            cost += c
        cost += self.term_calc(self.xs[-1])
        self.dterm = self.term_calc_diff(self.xs[-1])
        # gaps
        self.fs = np.zeros((self.T + 1, self.ndx))
        if not self.feasible:
            self.fs[0] = self.diff(self.xs[0], self.x0)
            for t in range(self.T):
                self.fs[t + 1] = self.diff(self.xs[t + 1], self.datas[t]["xnext"])
        return cost

    def _backward(self):
        T, ndx, nu = self.T, self.ndx, self.nu
        self.Vx = np.zeros((T + 1, ndx))
        self.Vxx = np.zeros((T + 1, ndx, ndx))
        self.Qu_ = np.zeros((T, nu))
        self.k = np.zeros((T, nu))
        self.K = np.zeros((T, nu, ndx))
        self.Quuk = np.zeros((T, nu))

        Vxx = self.dterm["Lxx"] + self.xreg * np.eye(ndx)
        Vx = self.dterm["Lx"] + Vxx @ self.fs[-1]
        self.Vxx[T], self.Vx[T] = Vxx, Vx
        for t in reversed(range(T)):
            d = self.datas[t]
            Fx, Fu = d["Fx"], d["Fu"]
            Qxx = d["Lxx"] + Fx.T @ Vxx @ Fx
            Qx = d["Lx"] + Fx.T @ Vx
            Qxu = d["Lxu"] + Fx.T @ Vxx @ Fu
            Quu = d["Luu"] + Fu.T @ Vxx @ Fu + self.ureg * np.eye(nu)
            Qu = d["Lu"] + Fu.T @ Vx
            try:
                L = np.linalg.cholesky(Quu)
            except np.linalg.LinAlgError:
                raise ArithmeticError("backward_error")
            kvec = np.linalg.solve(Quu, Qu)
            K = np.linalg.solve(Quu, Qxu.T)
            Quuk = Quu @ kvec
            Vx = Qx + K.T @ Quuk - 2.0 * K.T @ Qu
            Vxx = Qxx - Qxu @ K
            Vxx = 0.5 * (Vxx + Vxx.T) + self.xreg * np.eye(ndx)
            Vx = Vx + Vxx @ self.fs[t]
            if np.isnan(Vx).any() or np.isnan(Vxx).any():
                raise ArithmeticError("backward_error")
            self.Vx[t], self.Vxx[t] = Vx, Vxx
            self.Qu_[t], self.k[t], self.K[t], self.Quuk[t] = Qu, kvec, K, Quuk

    def _forward(self, alpha):
        xs_try = np.zeros_like(self.xs)
        us_try = np.zeros_like(self.us)
        cost_try = 0.0
        xnext = self.x0.copy()
        gs = 0.0 if (self.feasible or alpha == 1.0 or not self.fd) else (alpha - 1.0)
        for t in range(self.T):
            xs_try[t] = self.integrate(xnext, gs * self.fs[t])
            dx = self.diff(self.xs[t], xs_try[t])
            us_try[t] = self.us[t] - alpha * self.k[t] - self.K[t] @ dx
            xnext, c = self.calc(t, xs_try[t], us_try[t])
            cost_try += c
            if np.isnan(cost_try) or np.isnan(xnext).any():
                raise ArithmeticError("forward_error")
        xs_try[-1] = self.integrate(xnext, gs * self.fs[-1])
        cost_try += self.term_calc(xs_try[-1])
        if np.isnan(cost_try):
            raise ArithmeticError("forward_error")
        return xs_try, us_try, cost_try

    def _expected_improvement(self, xs_try):
        dg = float(np.sum(self.Qu_ * self.k))
        dq = -float(np.sum(self.k * self.Quuk))
        if self.fd:
            for t in range(self.T + 1):
                dg -= self.Vx[t] @ self.fs[t]
                dq += self.fs[t] @ (self.Vxx[t] @ self.fs[t])
            dv = 0.0
            if not self.feasible:
                for t in range(self.T + 1):
                    dx = self.diff(xs_try[t], self.xs[t])
                    dv -= self.fs[t] @ (self.Vxx[t] @ dx)
            return dg + dv, dq - 2.0 * dv
        return dg, dq

    # -- main ------------------------------------------------------------
    def solve(self, xs_init=None, us_init=None, maxiter=100, is_feasible=False,
              reginit=None):
        self.xs = (np.tile(self.x0, (self.T + 1, 1)) if xs_init is None
                   else np.array(xs_init, dtype=float))
        self.us = (np.zeros((self.T, self.nu)) if us_init is None
                   else np.array(us_init, dtype=float))
        self.feasible = is_feasible
        self.was_feasible = False
        self.xreg = self.ureg = self.regmin if reginit is None else reginit
        self.trace = []

        recalc = True
        cost = None
        for it in range(maxiter):
            self.iter = it
            while True:
                try:
                    if recalc:
                        cost = self._calc_diff()
                        self.cost = cost
                    self._backward()
                except ArithmeticError:
                    recalc = False
                    self.xreg = min(self.xreg * self.regfactor, self.regmax)
                    self.ureg = self.xreg
                    if self.xreg >= self.regmax:
                        return False
                    continue
                break

            recalc = False
            steplength = self.alphas[-1]
            d0 = d1 = 0.0
            for alpha in self.alphas:
                steplength = alpha
                try:
                    xs_try, us_try, cost_try = self._forward(alpha)
                except ArithmeticError:
                    continue
                dV = self.cost - cost_try
                d0, d1 = self._expected_improvement(xs_try)
                dVexp = alpha * (d0 + 0.5 * alpha * d1)
                if self.fd:
                    if dVexp >= 0:
                        ok = (d0 < self.th_grad) or (dV > self.th_acceptstep * dVexp)
                    else:
                        ok = dV > self.th_acceptnegstep * dVexp
                else:
                    ok = dVexp >= 0 and (
                        (d0 < self.th_grad) or (not self.feasible)
                        or (dV > self.th_acceptstep * dVexp))
                if ok:
                    self.was_feasible = self.feasible
                    self.xs, self.us = xs_try, us_try
                    self.feasible = ((self.was_feasible or steplength == 1.0)
                                     if self.fd else True)
                    self.cost = cost_try
                    recalc = True
                    break

            if steplength > self.th_stepdec:
                self.xreg = max(self.xreg / self.regfactor, self.regmin)
                self.ureg = self.xreg
            if steplength <= self.th_stepinc:
                self.xreg = min(self.xreg * self.regfactor, self.regmax)
                self.ureg = self.xreg
                if self.xreg >= self.regmax:
                    return False
            self.stop = float(np.sum(self.Qu_ ** 2))
            self.steplength = steplength
            self.trace.append(dict(iter=it, cost=self.cost, stop=self.stop,
                                   xreg=self.xreg, steplength=steplength,
                                   feasible=self.feasible))
            if self.was_feasible and self.stop < self.th_stop:
                self.iter = it + 1
                return True
        self.iter = maxiter
        return False


def unicycle_oracle(x0, T, dt=0.1, w=(10.0, 1.0), **kw):
    w0, w1 = w

    def calc(t, x, u):
        c, s = np.cos(x[2]), np.sin(x[2])
        xn = np.array([x[0] + c * u[0] * dt, x[1] + s * u[0] * dt,
                       x[2] + u[1] * dt])
        r = np.concatenate([w0 * x, w1 * u])
        return xn, 0.5 * r @ r

    def calc_diff(t, x, u):
        c, s = np.cos(x[2]), np.sin(x[2])
        Fx = np.eye(3)
        Fx[0, 2] = -s * u[0] * dt
        Fx[1, 2] = c * u[0] * dt
        Fu = np.zeros((3, 2))
        Fu[0, 0] = c * dt
        Fu[1, 0] = s * dt
        Fu[2, 1] = dt
        return dict(Fx=Fx, Fu=Fu, Lx=w0 ** 2 * x, Lu=w1 ** 2 * u,
                    Lxx=w0 ** 2 * np.eye(3), Lxu=np.zeros((3, 2)),
                    Luu=w1 ** 2 * np.eye(2))

    def term_calc(x):
        r = w0 * x
        return 0.5 * r @ r

    def term_calc_diff(x):
        return dict(Lx=w0 ** 2 * x, Lxx=w0 ** 2 * np.eye(3))

    return NumpyOracleSolver(calc, calc_diff, term_calc, term_calc_diff,
                             x0, T, 3, 2, **kw)


def lqr_oracle(params, x0, T, **kw):
    """params: dict with Fx,Fu,f0,Lxx,Lxu,Luu,lx,lu (numpy)."""
    p = {k: np.asarray(v, dtype=float) for k, v in params.items()}
    nx, nu = p["Fu"].shape

    def calc(t, x, u):
        xn = p["Fx"] @ x + p["Fu"] @ u + p["f0"]
        c = (0.5 * x @ (p["Lxx"] @ x) + 0.5 * u @ (p["Luu"] @ u)
             + x @ (p["Lxu"] @ u) + p["lx"] @ x + p["lu"] @ u)
        return xn, c

    def calc_diff(t, x, u):
        return dict(Fx=p["Fx"], Fu=p["Fu"],
                    Lx=p["lx"] + p["Lxx"] @ x + p["Lxu"] @ u,
                    Lu=p["lu"] + p["Lxu"].T @ x + p["Luu"] @ u,
                    Lxx=p["Lxx"], Lxu=p["Lxu"], Luu=p["Luu"])

    def term_calc(x):
        u = np.zeros(nu)
        return calc(0, x, u)[1]

    def term_calc_diff(x):
        u = np.zeros(nu)
        d = calc_diff(0, x, u)
        return dict(Lx=d["Lx"], Lxx=d["Lxx"])

    return NumpyOracleSolver(calc, calc_diff, term_calc, term_calc_diff,
                             x0, T, nx, nu, **kw)
