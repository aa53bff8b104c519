"""RH5 thesis analysis helpers: CoP and ZMP computation + CSV logging.

Reference: RH5/utils/utils.py — calcCoPs (:1181), calcZMPs (:1196),
logSolution (:845).  The thesis checks contact stability by comparing the
per-foot Center of Pressure (from the contact wrench) and the whole-body
Zero-Moment Point (from the gravito-inertial wrench) against the support
polygon.

TPU-native: everything is computed post-solve from the solution arrays with
vmapped sweeps; the ZMP uses a finite-difference rate of the centroidal
momentum along the trajectory (the reference reads pinocchio's
computeCentroidalMomentumTimeVariation at the solver's accelerations)."""

from __future__ import annotations

import csv
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..dynamics import algorithms as algo


def calc_cops(problem, sol) -> List[dict]:
    """Per-knot, per-active-contact CoP in the sole frame
    (RH5/utils/utils.py:1181-1194: CoP = (−τ_y/f_z, τ_x/f_z, 0)).

    Returns a list of dicts {t, contact_idx, f (6,), cop (3,)} for 6D
    contacts active at that knot."""
    out = []
    off = 0
    for seg in problem.segments:
        T_seg = jax.tree.leaves(seg)[0].shape[0]
        # all knots of a segment share one structure: a contact-free segment
        # is skipped wholesale (the base offset `off` advances once per
        # segment, below — never inside the knot loop)
        if (getattr(seg, "contacts", None) is None
                or not getattr(seg.contacts, "contacts", ())):
            off += T_seg
            continue
        for t in range(T_seg):
            m = jax.tree.map(lambda l: l[t], seg)
            contacts = m.contacts.contacts
            x, u = sol.xs[off + t], sol.us[off + t]
            _, cache = m._dynamics(x, u)
            for ci, c in enumerate(contacts):
                if c.nc != 6 or float(c.active) == 0.0:
                    continue
                f = np.asarray(cache.forces[ci])   # local (lin, ang)
                fz = f[2] if abs(f[2]) > 1e-9 else 1e-9
                cop = np.array([-f[4] / fz, f[3] / fz, 0.0])
                out.append(dict(t=off + t, contact_idx=ci, f=f, cop=cop))
        off += T_seg
    return out


def calc_zmps(problem, sol, dts: Optional[np.ndarray] = None) -> np.ndarray:
    """Whole-body ZMP per knot from the gravito-inertial wrench
    (RH5/utils/utils.py:1196-1229):

        f_gi  = m·g − d(h_lin)/dt          (eq. 8: gravity + inertia force)
        τ_gi  = −d(h_ang)/dt               (eq. 9 at the CoM)
        ZMP   = (−τ_y/f_z,  τ_x/f_z, 0)    (eq. 20)

    The momentum rate is the forward difference of the centroidal momentum
    h(q, v) along the trajectory (knots with dt=0 inherit the previous
    rate).  Returns (T, 3)."""
    m = problem.state.model
    nq = problem.state.nq
    xs = jnp.asarray(sol.xs)

    h = jax.vmap(lambda x: algo.centroidal_momentum(m, x[:nq], x[nq:]))(xs)
    h = np.asarray(h, np.float64)                       # (T+1, 6)

    if dts is None:
        parts = []
        for seg in problem.segments:
            T_seg = jax.tree.leaves(seg)[0].shape[0]
            dt_leaf = getattr(seg, "dt", None)
            if dt_leaf is None:           # impulse segment: instantaneous
                parts.append(np.zeros((T_seg,)))
            else:
                parts.append(np.broadcast_to(
                    np.asarray(dt_leaf, np.float64).reshape(-1), (T_seg,)))
        dts = np.concatenate(parts)
    dts = np.asarray(dts, np.float64)

    mass = float(np.sum(np.asarray(m.mass)))
    g = np.asarray(m.gravity, np.float64)

    T = h.shape[0] - 1
    zmps = np.zeros((T, 3))
    dh_prev = np.zeros(6)
    for k in range(T):
        if dts[k] > 0:
            dh = (h[k + 1] - h[k]) / dts[k]
            dh_prev = dh
        else:
            dh = dh_prev
        f_gi = mass * g - dh[:3]
        tau_gi = -dh[3:]
        fz = f_gi[2] if abs(f_gi[2]) > 1e-9 else 1e-9
        zmps[k] = [-tau_gi[1] / fz, tau_gi[0] / fz, 0.0]
    return zmps


def log_solution_csv(problem, sol, path: str,
                     dts: Optional[np.ndarray] = None) -> str:
    """RH5 logSolution analogue (utils.py:845): per-knot CSV with state,
    control, CoM, ZMP and per-foot CoPs."""
    m = problem.state.model
    nq = problem.state.nq
    xs = np.asarray(sol.xs)
    us = np.asarray(sol.us)
    coms = np.asarray(jax.vmap(
        lambda x: algo.center_of_mass(m, x[:nq]))(jnp.asarray(sol.xs)))
    zmps = calc_zmps(problem, sol, dts)
    cops = calc_cops(problem, sol)
    cop_by_t = {}
    for rec in cops:
        cop_by_t.setdefault(rec["t"], {})[rec["contact_idx"]] = rec["cop"]

    T = us.shape[0]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        head = (["t"] + [f"x{i}" for i in range(xs.shape[1])]
                + [f"u{i}" for i in range(us.shape[1])]
                + ["com_x", "com_y", "com_z", "zmp_x", "zmp_y"]
                + ["cop0_x", "cop0_y", "cop1_x", "cop1_y"])
        w.writerow(head)
        for t in range(T):
            c = cop_by_t.get(t, {})
            c0 = c.get(0, [np.nan] * 3)
            c1 = c.get(1, [np.nan] * 3)
            w.writerow([t] + list(xs[t]) + list(us[t])
                       + list(coms[t]) + list(zmps[t][:2])
                       + [c0[0], c0[1], c1[0], c1[1]])
    return path
