"""Fused node-linearization kernel (Pallas) — the calc_diff ceiling-breaker.

The per-node linearization (models/multibody/nodes.py:_tangent_outputs —
the reference's IntegratedActionModelEuler::calcDiff over
DAMContactFwdDynamics::calcDiff hot path, euler.hxx:83-131 +
contact-fwddyn.hxx:59-159) lowers under vmap to ~4.5k HLO ops per solve
step; every intermediate spills to HBM between fusions, putting the stage
~400x above its HBM roofline (benchmarks/ROOFLINE.md).  This module fuses
the ENTIRE node linearization — kinematic sweep, mass/bias contractions,
contact KKT, closed-form derivative contractions, cost residual Jacobians,
Gauss-Newton assembly and the Euler/manifold chain rule — into ONE Pallas
kernel per block of nodes, so every intermediate lives in VMEM and the
kernel reads x, u + node parameters (~2 KB/node) and writes only
(NodeDerivs, xnext, cost) (~13 KB/node).

Layout: **node-last ("lane") layout**.  Every per-node quantity carries a
TRAILING node axis of size ``NB`` (a multiple of the 128-lane VPU width);
small matrix dimensions (3, 6, nv, ndx) are leading/sublane axes.  All the
spatial algebra then becomes full-lane elementwise VPU ops; small
contractions are unrolled loops of fused multiply-adds — no MXU padding,
no per-op HBM round trips.

The same traced body runs three ways (``mode``):
  - "jnp":      plain XLA (correctness oracle; any backend, any dtype)
  - "pallas":   Mosaic-compiled TPU kernel (the production path)
  - "interpret": pallas interpreter (kernel-semantics tests on CPU)

Structure coverage is checked by :func:`supports`: Euler RigidBodyNode,
Full/FloatingBase actuation, Contact3D sets, and the closed-form cost zoo
(state / control / CoM / frame translation / frame velocity /
contact-force / friction-cone) with quad / weighted-quad / barrier /
weighted-barrier activations.  Unsupported structures fall back to the
generic jnp node path (problem.calc_diff_full decides per segment at trace
time).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..dynamics import algorithms as algo
from ..dynamics.model import JointType


NB = 128  # node-block width (lane axis)


# ---------------------------------------------------------------------------
# Lane math: trailing node axis everywhere
# ---------------------------------------------------------------------------

def lmm(A, B):
    """(..., m, k, N) @ (..., k, n, N) -> (..., m, n, N)."""
    return (A[..., :, :, None, :] * B[..., None, :, :, :]).sum(-3)


def lmm_chunk(A, B, chunk=6):
    """Chunked contraction for larger k: caps the rank-4 intermediate at
    (..., m, chunk, n, N)."""
    k = A.shape[-2]
    if k <= chunk:
        return lmm(A, B)
    out = None
    for i in range(0, k, chunk):
        t = lmm(A[..., :, i:i + chunk, :], B[..., i:i + chunk, :, :])
        out = t if out is None else out + t
    return out


def lmv(A, x):
    """(..., m, k, N) @ (..., k, N) -> (..., m, N)."""
    return (A * x[..., None, :, :]).sum(-2)


def lmtv(A, x):
    """(..., k, m, N), (..., k, N) -> (..., m, N)  (A^T x)."""
    return (A * x[..., :, None, :]).sum(-3)


def lT(A):
    """Transpose the two small matrix dims of (..., m, n, N)."""
    return jnp.swapaxes(A, -3, -2)


def lcross(a, b):
    """(..., 3, N) x (..., 3, N) -> (..., 3, N)."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1,
                      a2 * b0 - a0 * b2,
                      a0 * b1 - a1 * b0], axis=-2)


def lskew(v):
    """(..., 3, N) -> (..., 3, 3, N)."""
    z = jnp.zeros_like(v[..., 0, :])
    v0, v1, v2 = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    r0 = jnp.stack([z, -v2, v1], axis=-2)
    r1 = jnp.stack([v2, z, -v0], axis=-2)
    r2 = jnp.stack([-v1, v0, z], axis=-2)
    return jnp.stack([r0, r1, r2], axis=-3)


def leye(n, like):
    """(n, n, N) identity stack broadcast over lanes."""
    N = like.shape[-1]
    return jnp.broadcast_to(
        jnp.asarray(np.eye(n)[:, :, None], like.dtype), (n, n, N))


def lcat(parts, axis):
    return jnp.concatenate(parts, axis=axis)


class TL(NamedTuple):
    """Lane-layout spatial transform: R (..., 3, 3, N), p (..., 3, N)."""
    R: jnp.ndarray
    p: jnp.ndarray

    def compose(self, o: "TL") -> "TL":
        return TL(lmm(self.R, o.R), self.p + lmv(self.R, o.p))

    def inverse(self) -> "TL":
        RT = lT(self.R)
        return TL(RT, -lmv(RT, self.p))

    def act_motion(self, m):
        lin, ang = m[..., :3, :], m[..., 3:, :]
        Rl, Ra = lmv(self.R, lin), lmv(self.R, ang)
        return lcat([Rl + lcross(self.p, Ra), Ra], -2)

    def act_motion_inv(self, m):
        lin, ang = m[..., :3, :], m[..., 3:, :]
        a = lmtv(self.R, ang)
        l = lmtv(self.R, lin - lcross(self.p, ang))
        return lcat([l, a], -2)

    def act_force(self, f):
        lin, ang = f[..., :3, :], f[..., 3:, :]
        Rl, Ra = lmv(self.R, lin), lmv(self.R, ang)
        return lcat([Rl, Ra + lcross(self.p, Rl)], -2)

    def act_point(self, x):
        return self.p + lmv(self.R, x)


def lcross_motion(v, m):
    vl, w = v[..., :3, :], v[..., 3:, :]
    ml, ma = m[..., :3, :], m[..., 3:, :]
    return lcat([lcross(w, ml) + lcross(vl, ma), lcross(w, ma)], -2)


def lcross_force(v, f):
    vl, w = v[..., :3, :], v[..., 3:, :]
    fl, n = f[..., :3, :], f[..., 3:, :]
    return lcat([lcross(w, fl), lcross(w, n) + lcross(vl, fl)], -2)


# 6x6 operator builders (lane ports of algorithms._CM/_CF/_AD/_ADs)

def _z33(like):
    return jnp.zeros(like.shape, like.dtype)


def lCM(m):
    ml, ma = m[..., :3, :], m[..., 3:, :]
    sl, sa = lskew(ml), lskew(ma)
    top = lcat([-sa, -sl], -2)
    bot = lcat([_z33(sl), -sa], -2)
    return lcat([top, bot], -3)


def lCF(h):
    hl, hn = h[..., :3, :], h[..., 3:, :]
    sl, sn = lskew(hl), lskew(hn)
    top = lcat([_z33(sl), -sl], -2)
    bot = lcat([-sl, -sn], -2)
    return lcat([top, bot], -3)


def lAD(v):
    vl, vw = v[..., :3, :], v[..., 3:, :]
    swl, sww = lskew(vl), lskew(vw)
    top = lcat([sww, swl], -2)
    bot = lcat([_z33(swl), sww], -2)
    return lcat([top, bot], -3)


def lADs(v):
    vl, vw = v[..., :3, :], v[..., 3:, :]
    swl, sww = lskew(vl), lskew(vw)
    top = lcat([sww, _z33(swl)], -2)
    bot = lcat([swl, sww], -2)
    return lcat([top, bot], -3)


# ---------------------------------------------------------------------------
# Lane Lie-group ops (ports of dynamics/lie.py, trailing node axis)
# ---------------------------------------------------------------------------

_EPS2 = 1e-14


def lquat_to_rot(q):
    """q (..., 4, N) [x y z w] -> R (..., 3, 3, N)."""
    x, y, z, w = (q[..., i, :] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -2)
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -2)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -2)
    return jnp.stack([r0, r1, r2], -3)


def lrot_to_quat(R):
    """R (..., 3, 3, N) -> unit quaternion (x, y, z, w), w >= 0.

    Branchless Shepperd with the argmax replaced by a where-chain (lane
    friendly: no gathers)."""
    tr = R[..., 0, 0, :] + R[..., 1, 1, :] + R[..., 2, 2, :]
    q0 = jnp.stack([R[..., 2, 1, :] - R[..., 1, 2, :],
                    R[..., 0, 2, :] - R[..., 2, 0, :],
                    R[..., 1, 0, :] - R[..., 0, 1, :],
                    1.0 + tr], -2)
    q1 = jnp.stack([1.0 + R[..., 0, 0, :] - R[..., 1, 1, :] - R[..., 2, 2, :],
                    R[..., 0, 1, :] + R[..., 1, 0, :],
                    R[..., 0, 2, :] + R[..., 2, 0, :],
                    R[..., 2, 1, :] - R[..., 1, 2, :]], -2)
    q2 = jnp.stack([R[..., 0, 1, :] + R[..., 1, 0, :],
                    1.0 - R[..., 0, 0, :] + R[..., 1, 1, :] - R[..., 2, 2, :],
                    R[..., 1, 2, :] + R[..., 2, 1, :],
                    R[..., 0, 2, :] - R[..., 2, 0, :]], -2)
    q3 = jnp.stack([R[..., 0, 2, :] + R[..., 2, 0, :],
                    R[..., 1, 2, :] + R[..., 2, 1, :],
                    1.0 - R[..., 0, 0, :] - R[..., 1, 1, :] + R[..., 2, 2, :],
                    R[..., 1, 0, :] - R[..., 0, 1, :]], -2)

    def n2(q):
        return (q * q).sum(-2)

    best, bn = q0, n2(q0)
    for qc in (q1, q2, q3):
        nc = n2(qc)
        take = nc > bn
        best = jnp.where(take[..., None, :], qc, best)
        bn = jnp.where(take, nc, bn)
    q = best / jnp.sqrt(bn)[..., None, :]
    return q * jnp.where(q[..., 3:4, :] < 0, -1.0, 1.0)


def _ltheta(w):
    theta2 = (w * w).sum(-2)
    small = theta2 < _EPS2
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    return theta2, jnp.sqrt(t2s), small


def _latan2_pos(n, w):
    """atan2(n, w) for n, w >= 0 (first quadrant), Mosaic-compatible:
    the atan/atan2 primitives have no Pallas TPU lowering, so use a
    Cephes-style polynomial + two Newton corrections through the supported
    sin/cos (converges to full f64 precision from the ~1e-7 poly seed)."""
    dt = n.dtype
    tiny = jnp.asarray(1e-30, dt)
    swap = n > w
    num = jnp.where(swap, w, n)
    den = jnp.where(swap, n, w)
    r = num / jnp.maximum(den, tiny)                   # r in [0, 1]
    # Cephes atanf poly on [0, tan(pi/8)); one range fold at tan(pi/8)
    fold = r > 0.4142135623730950
    r2 = jnp.where(fold, (r - 1.0) / (r + 1.0), r)
    z = r2 * r2
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    th = r2 + r2 * z * p
    th = jnp.where(fold, th + jnp.asarray(np.pi / 4, dt), th)
    for _ in range(2):                                  # Newton: tan(th) = r
        s, c = jnp.sin(th), jnp.cos(th)
        th = th - (s * c - r * c * c)
    half_pi = jnp.asarray(np.pi / 2, dt)
    return jnp.where(swap, half_pi - th, th)


def lquat_log(q):
    vec, w = q[..., :3, :], q[..., 3, :]
    sgn = jnp.where(w < 0, -1.0, 1.0)
    vec, w = vec * sgn[..., None, :], w * sgn
    n2 = (vec * vec).sum(-2)
    small = n2 < _EPS2
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    angle = 2.0 * _latan2_pos(n, w)
    scale = jnp.where(small, 2.0 / w - 2.0 * n2 / (3.0 * w ** 3), angle / n)
    return vec * scale[..., None, :]


def llog3(R):
    return lquat_log(lrot_to_quat(R))


def lexp3(w):
    theta2, theta, small = _ltheta(w)
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    W = lskew(w)
    return (leye(3, w) + s[..., None, None, :] * W
            + c[..., None, None, :] * lmm(W, W))


def ljac_so3_right_inv(w):
    theta2, theta, small = _ltheta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  1.0 / t2 - (1.0 + jnp.cos(theta))
                  / (2.0 * theta * jnp.sin(theta)))
    W = lskew(w)
    return leye(3, w) + 0.5 * W + c[..., None, None, :] * lmm(W, W)


def lse3_v_matrix(w):
    theta2, theta, small = _ltheta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / t2)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - jnp.sin(theta)) / (t2 * theta))
    W = lskew(w)
    return (leye(3, w) + c1[..., None, None, :] * W
            + c2[..., None, None, :] * lmm(W, W))


def lse3_v_inv(w):
    theta2, theta, small = _ltheta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  1.0 / t2 - (1.0 + jnp.cos(theta))
                  / (2.0 * theta * jnp.sin(theta)))
    W = lskew(w)
    return leye(3, w) - 0.5 * W + c[..., None, None, :] * lmm(W, W)


def lexp6(xi):
    v, w = xi[..., :3, :], xi[..., 3:, :]
    return lexp3(w), lmv(lse3_v_matrix(w), v)


def llog6(R, p):
    w = llog3(R)
    v = lmv(lse3_v_inv(w), p)
    return lcat([v, w], -2)


def lse3_adjoint(R, p):
    pR = lmm(lskew(p), R)
    z = jnp.zeros_like(R)
    top = lcat([R, pR], -2)
    bot = lcat([z, R], -2)
    return lcat([top, bot], -3)


def _lse3_Q_left(v, w):
    theta2, theta, small = _ltheta(w)
    t2 = jnp.where(small, 1.0, theta2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - sin_t) / (t2 * theta))
    m2 = jnp.where(small, -1.0 / 24.0 + theta2 / 720.0,
                   (1.0 - 0.5 * theta2 - cos_t) / (t2 * t2))
    m3 = jnp.where(small, -1.0 / 120.0 + theta2 / 5040.0,
                   (theta - sin_t - theta2 * theta / 6.0) / (t2 * t2 * theta))
    V, W = lskew(v), lskew(w)
    WV, VW = lmm(W, V), lmm(V, W)
    WVW = lmm(WV, W)
    WWV, VWW = lmm(W, WV), lmm(VW, W)
    WVWW = lmm(WVW, W)
    WWVW = lmm(W, WVW)
    e = lambda c: c[..., None, None, :]
    return (0.5 * V + e(c1) * (WV + VW + WVW)
            - e(m2) * (WWV + VWW - 3.0 * WVW)
            - 0.5 * e(m2 - 3.0 * m3) * (WVWW + WWVW))


def ljac_se3_left(xi):
    v, w = xi[..., :3, :], xi[..., 3:, :]
    Jl = lse3_v_matrix(w)
    Q = _lse3_Q_left(v, w)
    z = jnp.zeros_like(Jl)
    top = lcat([Jl, Q], -2)
    bot = lcat([z, Jl], -2)
    return lcat([top, bot], -3)


def ljac_se3_right(xi):
    return ljac_se3_left(-xi)


def ljac_se3_right_inv(xi):
    v, w = xi[..., :3, :], xi[..., 3:, :]
    Jri = ljac_so3_right_inv(w)
    Qr = _lse3_Q_left(-v, -w)
    QJ = lmm(Qr, Jri)
    top_r = -lmm(Jri, QJ)
    z = jnp.zeros_like(Jri)
    top = lcat([Jri, top_r], -2)
    bot = lcat([z, Jri], -2)
    return lcat([top, bot], -3)


# ---------------------------------------------------------------------------
# Lane Cholesky + triangular solves (unrolled over static n)
# ---------------------------------------------------------------------------

def lchol(M):
    """Lower Cholesky of (n, n, N) — column-vectorized unroll
    (ops/smallchol.py pattern, trailing batch)."""
    n = M.shape[-3]
    dt = M.dtype
    cols = []
    for j in range(n):
        s = M[:, j, :]                                  # (n, N)
        if cols:
            prev = jnp.stack(cols, axis=1)              # (n, j, N)
            rowj = prev[j]                              # (j, N)
            s = s - (prev * rowj[None]).sum(1)
        d = jnp.sqrt(s[j])
        col = s / d[None]
        mask = jnp.asarray((np.arange(n) > j).astype(np.float64)[:, None],
                           dt)
        col = col * mask
        col = col + d[None] * jnp.asarray(
            (np.arange(n) == j).astype(np.float64)[:, None], dt)
        cols.append(col)
    return jnp.stack(cols, axis=1)


def lsolve_lower(L, B):
    """X with L X = B; L (n, n, N), B (n, m, N)."""
    n = L.shape[-3]
    rows = []
    # NOTE: all indexing below is CHAINED single-axis (L[i][j]), which
    # lowers to static slice+squeeze — combined multi-int indexing
    # (L[i, j]) lowers to a gather, which Mosaic cannot compile.
    for i in range(n):
        s = B[i]                                        # (m, N)
        if rows:
            prev = jnp.stack(rows, axis=0)              # (i, m, N)
            s = s - (L[i][:i][:, None, :] * prev).sum(0)
        rows.append(s / L[i][i][None])
    return jnp.stack(rows, axis=0)


def lsolve_upper_t(L, B):
    """X with L^T X = B (L lower); back substitution."""
    n = L.shape[-3]
    rows = [None] * n
    for i in range(n - 1, -1, -1):
        s = B[i]
        done = [L[k][i][None, :] * rows[k] for k in range(i + 1, n)]
        if done:
            s = s - sum(done)
        rows[i] = s / L[i][i][None]
    return jnp.stack(rows, axis=0)


def lcho_solve(L, B):
    return lsolve_upper_t(L, lsolve_lower(L, B))


def lcho_solve_vec(L, b):
    return lcho_solve(L, b[:, None, :])[:, 0, :]

# ---------------------------------------------------------------------------
# Lane kinematics: the level-synchronous sweep in node-last layout
# (port of dynamics/algorithms.KinData with per-joint Python loops — nj is
# small and static, so the trace is O(nj) lane ops)
# ---------------------------------------------------------------------------

class LInertia(NamedTuple):
    m: jnp.ndarray     # (nj, N)
    c: jnp.ndarray     # (nj, 3, N)
    Ic: jnp.ndarray    # (nj, 3, 3, N)

    def to_matrix(self):
        cx = lskew(self.c)
        m = self.m[..., None, None, :]
        eye = leye(3, self.c)
        I_bar = self.Ic - m * lmm(cx, cx)
        top = lcat([m * eye, -m * cx], -2)
        bot = lcat([m * cx, I_bar], -2)
        return lcat([top, bot], -3)

    def mul_motion(self, v):
        vl, w = v[..., :3, :], v[..., 3:, :]
        m = self.m[..., None, :]
        cx = lskew(self.c)
        fl = m * (vl - lcross(self.c, w))
        fa = (m * lcross(self.c, vl) + lmv(self.Ic, w)
              - m * lmv(cx, lmv(cx, w)))
        return lcat([fl, fa], -2)


class LKin(NamedTuple):
    model: object              # transposed-lane RobotModel pytree
    meta: tuple                # algo._meta static tuple
    q: jnp.ndarray             # (nq, N)
    v: jnp.ndarray             # (nv, N)
    oR: jnp.ndarray            # (nj, 3, 3, N)
    op: jnp.ndarray            # (nj, 3, N)
    vels: jnp.ndarray          # (nj, 6, N) joint-local
    biasacc: jnp.ndarray       # (nj, 6, N) joint-local
    Jcols: jnp.ndarray         # (nv, 6, N) world Jacobian columns
    vel_w: jnp.ndarray         # (nj, 6, N)
    Iw: LInertia               # world spatial inertias

    def oMi(self, j) -> TL:
        return TL(self.oR[j], self.op[j])

    # -- frame quantities (static fid) ---------------------------------
    def _fX(self, fid) -> TL:
        return TL(self.model.fp_R[fid], self.model.fp_p[fid])

    def frame_placement(self, fid) -> TL:
        j = self.model.frame_parents[fid]
        return self.oMi(j).compose(self._fX(fid))

    def frame_velocity(self, fid):
        j = self.model.frame_parents[fid]
        return self._fX(fid).act_motion_inv(self.vels[j])

    def frame_bias_acc(self, fid):
        j = self.model.frame_parents[fid]
        return self._fX(fid).act_motion_inv(self.biasacc[j])

    def amask_np(self):
        return self.meta[3]                 # (nj, nv) numpy

    def com(self):
        m = self.Iw.m
        return (m[:, None, :] * self.Iw.c).sum(0) / m.sum(0)[None]


def lane_kin(model, meta, q, v) -> LKin:
    """One lane-layout kinematic sweep (KinData.__init__ port)."""
    dt = q.dtype
    nj = len(model.joint_types)
    levels, v_off, nv, amask_np, dof_joint, _, _, _ = meta
    types = [JointType(t) for t in model.joint_types]
    has_ff = types[0] == JointType.FREE_FLYER
    N = q.shape[-1]

    # per-joint local placement (parent<-joint), subspace, local joint vel
    R_pl, p_pl, S6, vJ = [None] * nj, [None] * nj, [None] * nj, [None] * nj
    for j in range(nj):
        if types[j] == JointType.FREE_FLYER:
            Rff = lquat_to_rot(q[3:7])
            R_pl[j] = lmm(model.jp_R[j], Rff)
            p_pl[j] = model.jp_p[j] + lmv(model.jp_R[j], q[:3])
            S6[j] = jnp.zeros((6, N), dt)
            vJ[j] = v[:6]
        else:
            qoff = v_off[j] + (1 if has_ff else 0)
            qj = q[qoff]                                   # (N,)
            ax = model.axis[j]                             # (3, N)
            if types[j] == JointType.REVOLUTE:
                K = lskew(ax)
                s, c = jnp.sin(qj), jnp.cos(qj)
                R_J = (leye(3, ax) + s[None, None] * K
                       + (1.0 - c)[None, None] * lmm(K, K))
                R_pl[j] = lmm(model.jp_R[j], R_J)
                p_pl[j] = model.jp_p[j]
                S6[j] = lcat([jnp.zeros((3, N), dt), ax], 0)
            else:  # prismatic
                R_pl[j] = model.jp_R[j]
                p_pl[j] = model.jp_p[j] + lmv(model.jp_R[j], ax * qj[None])
                S6[j] = lcat([ax, jnp.zeros((3, N), dt)], 0)
            vJ[j] = S6[j] * v[v_off[j]][None]

    # world FK + joint-local velocity/bias recursion (tree order)
    oR, op = [None] * nj, [None] * nj
    vel, bias = [None] * nj, [None] * nj
    for j in range(nj):
        p = model.parents[j]
        Xpl = TL(R_pl[j], p_pl[j])
        Xup = Xpl.inverse()
        if p == -1:
            oR[j], op[j] = R_pl[j], p_pl[j]
            vel[j] = vJ[j]
            bias[j] = lcross_motion(vel[j], vJ[j])
        else:
            oR[j] = lmm(oR[p], R_pl[j])
            op[j] = op[p] + lmv(oR[p], p_pl[j])
            v_l = Xup.act_motion(vel[p]) + vJ[j]
            vel[j] = v_l
            bias[j] = Xup.act_motion(bias[p]) + lcross_motion(v_l, vJ[j])
    oR = jnp.stack(oR)
    op = jnp.stack(op)
    vels = jnp.stack(vel)
    biasacc = jnp.stack(bias)

    # world Jacobian columns (nv, 6, N)
    cols = [None] * nv
    for j in range(nj):
        Xw = TL(oR[j], op[j])
        if types[j] == JointType.FREE_FLYER:
            e6 = jnp.broadcast_to(jnp.asarray(np.eye(6)[:, :, None], dt),
                                  (6, 6, N))
            ff_cols = TL(Xw.R[None], Xw.p[None]).act_motion(e6)   # (6, 6, N)
            for k in range(6):
                cols[v_off[j] + k] = ff_cols[k]
        else:
            cols[v_off[j]] = Xw.act_motion(S6[j])
    Jcols = jnp.stack(cols)

    oX = TL(oR, op)
    vel_w = oX.act_motion(vels)
    c_w = oX.act_point(model.com)
    Iw = LInertia(m=model.mass, c=c_w,
                  Ic=lmm(lmm(oR, model.inertia), lT(oR)))
    return LKin(model=model, meta=meta, q=q, v=v, oR=oR, op=op, vels=vels,
                biasacc=biasacc, Jcols=Jcols, vel_w=vel_w, Iw=Iw)


def lane_mass_matrix(kin: LKin, armature=None):
    """M = Σ_i J_iᵀ I_i J_i, looped over bodies (KinData.mass_matrix).

    Scatter-free: each body's masked Jacobian is a DENSE (nv, 6, N) array
    (zeros outside the ancestor dofs), so the accumulation is plain adds —
    no gathers/scatters for Mosaic to choke on."""
    amask = kin.amask_np()
    nj = amask.shape[0]
    Iw6 = kin.Iw.to_matrix()                            # (nj, 6, 6, N)
    dt = kin.Jcols.dtype
    M = None
    for i in range(nj):
        m_i = jnp.asarray(amask[i][:, None, None], dt)  # (nv, 1, 1) static
        Jw = kin.Jcols * m_i                            # (nv, 6, N)
        A = lmm(Jw, Iw6[i])                             # (nv, 6, N)
        Mi = lmm(A, jnp.swapaxes(Jw, 0, 1))             # (nv, nv, N)
        M = Mi if M is None else M + Mi
    if armature is not None:
        nv = kin.Jcols.shape[0]
        M = M + leye(nv, M) * armature[:, None, :]
    return M


def lane_bias_forces(kin: LKin):
    """b(q, v) (KinData.bias_forces port)."""
    dt = kin.q.dtype
    g6 = lcat([-kin.model.gravity, jnp.zeros_like(kin.model.gravity)], 0)
    oX = TL(kin.oR, kin.op)
    a_w = oX.act_motion(kin.biasacc) + g6[None]
    f_w = (kin.Iw.mul_motion(a_w)
           + lcross_force(kin.vel_w, kin.Iw.mul_motion(kin.vel_w)))
    amask = kin.amask_np()
    nv = kin.Jcols.shape[0]
    b = jnp.zeros((nv, f_w.shape[-1]), dt)
    for i in range(amask.shape[0]):
        m_i = jnp.asarray(amask[i][:, None], dt)
        b = b + m_i * (kin.Jcols * f_w[i][None]).sum(1)
    return b


# ---------------------------------------------------------------------------
# Closed-form generalized-force derivatives, lane layout
# (port of algorithms.gforce_derivatives)
# ---------------------------------------------------------------------------

def _stack_parent(arr, parents):
    """arr (nj, ..., N) -> parent rows (zeros at roots), via STATIC Python
    indexing (no gather: Pallas kernels cannot capture index constants)."""
    z = jnp.zeros_like(arr[0])
    return jnp.stack([arr[p] if p != -1 else z for p in parents])


def _stack_pick(arr, idx):
    """arr[idx] with a static Python index list (gather-free)."""
    return jnp.stack([arr[i] for i in idx])


def _lane_common(kin: LKin):
    model, meta = kin.model, kin.meta
    levels, v_off, nv, amask_np, dof_joint, _, _, _ = meta
    dt = kin.q.dtype
    nj = amask_np.shape[0]
    dofj = [int(j) for j in np.asarray(dof_joint)]
    parents = [int(p) for p in model.parents]

    S = kin.Jcols                                        # (nv, 6, N)
    vw = kin.vel_w                                       # (nj, 6, N)
    vp_w = _stack_parent(vw, parents)                    # (nj, 6, N)
    vJ_w = vw - vp_w
    wv = _stack_pick(vp_w, dofj)                         # (nv, 6, N)
    vjd = _stack_pick(vw, dofj)
    oX = TL(kin.oR, kin.op)
    bias_w = oX.act_motion(kin.biasacc)
    return (model, meta, dt, nj, nv, dofj, parents, S, vw, vp_w,
            vJ_w, wv, vjd, oX, bias_w, amask_np)


def _lane_PS(kin, Jm_np, vw, vJ_w):
    """PS_i = Σ_{k⪯i} K_k with K = CM(vJ)CM(v) + AD(v)CM(vJ)."""
    CMv = lCM(vw)
    CMvJ = lCM(vJ_w)
    K = lmm(CMvJ, CMv) + lmm(lAD(vw), CMvJ)              # (nj, 6, 6, N)
    Jm = jnp.asarray(Jm_np[:, :, None, None, None], K.dtype)
    PS = (Jm * K[None]).sum(1)                           # (nj, 6, 6, N)
    return PS, CMv


class LTanCtx(NamedTuple):
    """a-dependent spatial-algebra context shared by gforce_derivatives and
    every frame_tangents call (computed ONCE per node block: the PS prefix
    sums and the u/cw/cu fields were previously recomputed per frame)."""
    dt: object
    nj: int
    nv: int
    dofj: tuple
    parents: tuple
    amask_np: object
    S: jnp.ndarray
    vw: jnp.ndarray
    vp_w: jnp.ndarray
    vJ_w: jnp.ndarray
    wv: jnp.ndarray
    vjd: jnp.ndarray
    oX: TL
    bias_w: jnp.ndarray
    amask_l: jnp.ndarray
    u: jnp.ndarray
    uw: jnp.ndarray
    PS: jnp.ndarray
    PS_pd: jnp.ndarray
    CMv: jnp.ndarray
    cw: jnp.ndarray
    cu: jnp.ndarray


def lane_tan_ctx(kin: LKin, a) -> LTanCtx:
    (model, meta, dt, nj, nv, dofj, parents, S, vw, vp_w, vJ_w,
     wv, vjd, oX, bias_w, amask_np) = _lane_common(kin)
    v_off = meta[1]
    Jm_np = amask_np[:, np.asarray([v_off[k] for k in range(nj)])]
    amask_l = jnp.asarray(amask_np[:, :, None, None], dt)
    ua = S * a[:, None, :]
    u = (amask_l * ua[None]).sum(1)                      # (nj, 6, N)
    uw = _stack_pick(_stack_parent(u, parents), dofj)    # (nv, 6, N)
    PS, CMv = _lane_PS(kin, Jm_np, vw, vJ_w)
    PS_pd = _stack_pick(_stack_parent(PS, parents), dofj)
    cw = lcross_motion(S, wv)
    cu = lcross_motion(S, uw)
    return LTanCtx(dt=dt, nj=nj, nv=nv, dofj=tuple(dofj),
                   parents=tuple(parents), amask_np=amask_np, S=S, vw=vw,
                   vp_w=vp_w, vJ_w=vJ_w, wv=wv, vjd=vjd, oX=oX,
                   bias_w=bias_w, amask_l=amask_l, u=u, uw=uw, PS=PS,
                   PS_pd=PS_pd, CMv=CMv, cw=cw, cu=cu)


def lane_gforce_derivatives(kin: LKin, a, ext_w=None, ctx: LTanCtx = None):
    """(dG_dq, dG_dv) each (nv, nv, N) — algorithms.gforce_derivatives."""
    if ctx is None:
        ctx = lane_tan_ctx(kin, a)
    (dt, nj, nv, dofj, parents, amask_np, S, vw, vp_w, vJ_w, wv, vjd, oX,
     bias_w) = (ctx.dt, ctx.nj, ctx.nv, ctx.dofj, ctx.parents, ctx.amask_np,
                ctx.S, ctx.vw, ctx.vp_w, ctx.vJ_w, ctx.wv, ctx.vjd, ctx.oX,
                ctx.bias_w)
    model = kin.model
    Am2 = amask_np[np.asarray(dofj)].T                   # (nv, nv) numpy
    g6 = lcat([-model.gravity, jnp.zeros_like(model.gravity)], 0)
    Iw6 = kin.Iw.to_matrix()                             # (nj, 6, 6, N)
    amask_l = ctx.amask_l
    u, uw = ctx.u, ctx.uw

    biasg = bias_w + g6[None]
    a_w = biasg + u
    h = kin.Iw.mul_motion(a_w)
    h2 = kin.Iw.mul_motion(vw)
    f = h + lcross_force(vw, h2)
    if ext_w is not None:
        f = f - ext_w

    PS, CMv = ctx.PS, ctx.CMv
    PS_pd = ctx.PS_pd                                    # (nv, 6, 6, N)

    CFh2 = lCF(h2)
    ADsv = lADs(vw)
    G_q = (lCF(h) - lmm(Iw6, lCM(biasg)) + lmm(Iw6, PS)
           + lmm(CFh2, CMv) + lmm(ADsv, CFh2))
    if ext_w is not None:
        G_q = G_q - lCF(ext_w)
    Gv = CFh2 + lmm(ADsv, Iw6) + lmm(Iw6, CMv)           # (nj, 6, 6, N)

    cw, cu = ctx.cw, ctx.cu                              # (nv, 6, N)
    z2 = lcross_motion(cw, wv)
    zeta_q = -cu - lmv(PS_pd, S) + z2
    cj = lcross_motion(vjd, S)
    zeta_v = -cw + cj

    def pair_multi(kerns, rights):
        """Σ_k Σ_i [e⪯i][d⪯i] S_eᵀ kerns[k]_i rights[k]_d → (nv, nv, N).

        Scatter-free: ancestry masks are applied as dense (nv, 1, 1)
        multiplies of the per-body blocks."""
        out = None
        for K6, R6 in zip(kerns, rights):
            for i in range(nj):
                m_i = jnp.asarray(amask_np[i][:, None, None], S.dtype)
                A = lmm(S * m_i, K6[i])                   # (nv, 6, N)
                B = jnp.swapaxes(R6 * m_i, 0, 1)          # (6, nv, N)
                blk = lmm(A, B)                           # (nv, nv, N)
                out = blk if out is None else out + blk
        return out

    # dS_e term
    F = (amask_l * f[:, None]).sum(0)                    # (nv, 6, N)
    QF = lcross_force(S, F)                              # (nv, 6, N)
    T1 = (QF[:, None] * S[None]).sum(-2)                 # (nv_e, nv_d, N)
    T1 = T1 * jnp.asarray(Am2.T[:, :, None], dt)

    dG_dq = T1 + pair_multi([G_q, Iw6, -Gv], [S, zeta_q, cw])
    dG_dv = pair_multi([Gv, Iw6], [S, zeta_v])
    return dG_dq, dG_dv


class LFrameTangents(NamedTuple):
    dxi: jnp.ndarray   # (ndx, 6, N)
    dp: jnp.ndarray    # (ndx, 3, N)
    dv: jnp.ndarray    # (ndx, 6, N)
    dab: jnp.ndarray   # (ndx, 6, N)
    dJa: jnp.ndarray   # (ndx, 6, N)


def lane_frame_tangents(kin: LKin, a, fid,
                        ctx: LTanCtx = None) -> LFrameTangents:
    """algorithms.frame_tangents port (closed-form frame-quantity tangents);
    the heavy a-dependent context is shared across frames via ``ctx``."""
    if ctx is None:
        ctx = lane_tan_ctx(kin, a)
    (dt, nv, S, vw, wv, vjd, bias_w, amask_np) = (
        ctx.dt, ctx.nv, ctx.S, ctx.vw, ctx.wv, ctx.vjd, ctx.bias_w,
        ctx.amask_np)
    model = kin.model
    j = model.frame_parents[fid]
    N = S.shape[-1]
    PS, PS_pd = ctx.PS, ctx.PS_pd
    cw, cu = ctx.cw, ctx.cu

    mask = jnp.asarray(amask_np[j][:, None, None], dt)   # (nv, 1, 1)
    Y = kin.frame_placement(fid)
    Yinv = Y.inverse()
    Yb = TL(Yinv.R[None], Yinv.p[None])                  # broadcast over nv
    zq = jnp.zeros((nv, 3, N), dt)
    z6 = jnp.zeros((nv, 6, N), dt)

    dxi_q = mask * Yb.act_motion(S)
    dp_q = mask * (S[:, :3] + lcross(S[:, 3:], Y.p[None]))
    dv_q = -mask * Yb.act_motion(cw)
    dv_v = mask * Yb.act_motion(S)
    dJa_q = -mask * Yb.act_motion(cu)

    vj = vw[j]
    wdiff = vj[None] - wv                                # (nv, 6, N)
    dbias_w_q = (lmv(PS[j][None], S) - lmv(PS_pd, S)
                 - lcross_motion(cw, wdiff))
    dab_q = mask * Yb.act_motion(
        dbias_w_q - lcross_motion(S, bias_w[j][None]))
    dbias_w_v = lcross_motion(S, wdiff) + lcross_motion(vjd, S)
    dab_v = mask * Yb.act_motion(dbias_w_v)

    cat = jnp.concatenate
    return LFrameTangents(
        dxi=cat([dxi_q, z6]), dp=cat([dp_q, zq]),
        dv=cat([dv_q, dv_v]), dab=cat([dab_q, dab_v]),
        dJa=cat([dJa_q, z6]))

# ---------------------------------------------------------------------------
# Lane contacts (Contact3D) — ports of models/multibody/contacts.py
# ---------------------------------------------------------------------------

def _lane_contact3d_calc(c, kin: LKin):
    """Returns (Jc (3, nv, N), a0 (3, N)) for one Contact3D (masked by the
    caller)."""
    j = kin.model.frame_parents[c.fid]
    mask_anc = jnp.asarray(kin.amask_np()[j][:, None, None], kin.q.dtype)
    cols = kin.Jcols * mask_anc                       # (nv, 6, N)
    Y = kin.frame_placement(c.fid)
    Yinv = Y.inverse()
    Jl = TL(Yinv.R[None], Yinv.p[None]).act_motion(cols)  # (nv, 6, N)
    Jc = jnp.swapaxes(Jl[:, :3], 0, 1)                # (3, nv, N)
    vf = kin.frame_velocity(c.fid)
    vv, vw = vf[:3], vf[3:]
    ab = kin.frame_bias_acc(c.fid)
    a0 = (ab[:3] + lcross(vw, vv)
          + c.gains[0][None] * (Y.p - c.pref)
          + c.gains[1][None] * vv)
    return Jc, a0


def _lane_contact3d_tangent(c, kin: LKin, ft: LFrameTangents):
    """d(−(Jc·a + a0))/dx (ndx, 3, N) — Contact3D.calc_tangent port."""
    vf = kin.frame_velocity(c.fid)
    vv, vw = vf[:3], vf[3:]
    dvv, dvw = ft.dv[:, :3], ft.dv[:, 3:]
    da0 = (ft.dab[:, :3] + lcross(dvw, vv[None]) + lcross(vw[None], dvv)
           + c.gains[0][None, None] * ft.dp + c.gains[1][None, None] * dvv)
    return -(ft.dJa[:, :3] + da0)


# ---------------------------------------------------------------------------
# Lane costs: residuals + closed-form Jacobians per supported type
# ---------------------------------------------------------------------------

def _lane_state_diff(st_has_ff, nq, nv, xref, x):
    """st.diff(xref, x) in lanes -> ((ndx, N), d6_or_None)."""
    if not st_has_ff:
        return x - xref, None
    M0 = TL(lquat_to_rot(xref[3:7]), xref[:3])
    M1 = TL(lquat_to_rot(x[3:7]), x[:3])
    D = M0.inverse().compose(M1)
    d6 = llog6(D.R, D.p)
    return lcat([d6, x[7:nq] - xref[7:nq], x[nq:] - xref[nq:]], 0), d6


def _lane_activation(act, R):
    """(a, Ar, Arr) lane versions of the supported activations; R (nr, N)."""
    from ..models.multibody.activations import (
        ActivationQuad, ActivationQuadraticBarrier, ActivationWeightedQuad,
        ActivationWeightedQuadraticBarrier)
    if isinstance(act, ActivationQuad):
        return 0.5 * (R * R).sum(0), R, jnp.ones_like(R)
    if isinstance(act, ActivationWeightedQuad):
        w = act.weights                                # (nr, N)
        wr = w * R
        return 0.5 * (R * wr).sum(0), wr, w
    if isinstance(act, ActivationQuadraticBarrier):
        rlb = jnp.minimum(R - act.lb, 0.0)
        rub = jnp.maximum(R - act.ub, 0.0)
        a = 0.5 * (rlb * rlb).sum(0) + 0.5 * (rub * rub).sum(0)
        Ar = rlb + rub
        active = ((R - act.lb) <= 0.0) | ((R - act.ub) >= 0.0)
        return a, Ar, active.astype(R.dtype)
    if isinstance(act, ActivationWeightedQuadraticBarrier):
        rlb = jnp.minimum(R - act.lb, 0.0)
        rub = jnp.maximum(R - act.ub, 0.0)
        rb = rlb + rub
        wrb = act.weights * rb
        a = 0.5 * (rb * wrb).sum(0)
        active = ((R - act.lb) <= 0.0) | ((R - act.ub) >= 0.0)
        return a, wrb, act.weights * active.astype(R.dtype)
    raise NotImplementedError(type(act))


def _lane_com_jac(kin: LKin):
    """dcom/dx (3, ndx, N) (CostCoM.residual_jac_x port)."""
    dt = kin.q.dtype
    S = kin.Jcols                                      # (nv, 6, N)
    nv = S.shape[0]
    amask2 = jnp.asarray(kin.amask_np()[:, :, None], dt)
    amask3 = jnp.asarray(kin.amask_np()[:, :, None, None], dt)
    m = kin.Iw.m                                       # (nj, N)
    msub = (amask2 * m[:, None, :]).sum(0)             # (nv, N)
    csub = (amask3 * (m[:, None, None, :]
            * kin.Iw.c[:, None, :, :])).sum(0)         # (nv, 3, N)
    mtot = m.sum(0)                                    # (N,)
    dcom_q = (msub[:, None, :] * S[:, :3]
              + lcross(S[:, 3:], csub)) / mtot[None, None]
    N = S.shape[-1]
    zero_v = jnp.zeros((nv, 3, N), dt)
    return jnp.swapaxes(lcat([dcom_q, zero_v], 0), 0, 1)  # (3, ndx, N)


# ---------------------------------------------------------------------------
# The fused node linearization (lane layout throughout)
# ---------------------------------------------------------------------------

def lane_calc_both(seg, x, u):
    """Full node linearization for a lane block: x (nx, N), u (nu, N), seg a
    node pytree whose leaves carry a TRAILING node axis.  Returns
    (NodeDerivs, xnext (nx, N), cost (N,)) in lane layout.

    Port of models/multibody/nodes.RigidBodyNode._tangent_outputs +
    calc_both (Gauss-Newton + Euler/manifold chain), specialized to the
    closed-form structure checked by :func:`supports`."""
    from ..core.action import NodeDerivs
    from ..models.multibody.actuations import (FloatingBaseActuation,
                                               FullActuation)
    from ..models.multibody.costs import (
        CostCoM, CostContactForce, CostContactFrictionCone, CostControl,
        CostFrameTranslation, CostFrameVelocity, CostState)

    st = seg.state_
    model = st.model
    meta = algo._tree_meta(tuple(model.parents), tuple(model.joint_types),
                           tuple(model.frame_parents))
    nq, nv = st.nq, st.nv
    ndx = 2 * nv
    nu = seg.actuation.nu
    dtt = x.dtype
    N = x.shape[-1]
    has_ff = JointType(model.joint_types[0]) == JointType.FREE_FLYER

    q, v = x[:nq], x[nq:]
    kin = lane_kin(model, meta, q, v)

    # -- actuation (constant maps; dtau_dx = 0) ----------------------------
    if isinstance(seg.actuation, FloatingBaseActuation):
        tau = lcat([jnp.zeros((6, N), dtt), u], 0)
        dtau_du_np = np.concatenate(
            [np.zeros((6, nu)), np.eye(nu)], axis=0)
    elif isinstance(seg.actuation, FullActuation):
        tau = u
        dtau_du_np = np.eye(nu)
    else:  # pragma: no cover — guarded by supports()
        raise NotImplementedError(type(seg.actuation))
    dtau_du = jnp.broadcast_to(
        jnp.asarray(dtau_du_np[:, :, None], dtt), (nv, nu, N))

    M = lane_mass_matrix(kin, seg.armature)
    b = lane_bias_forces(kin)
    tau_mb = tau - b

    contacts = (tuple(seg.contacts.contacts)
                if seg.contacts is not None else ())
    nc = sum(c.nc for c in contacts)

    # frame-tangent cache shared by contacts and frame costs (needs the
    # accel `a`, so it is populated lazily after the KKT solve)
    fts = {}

    if nc:
        Js, a0s, masks = [], [], []
        for c in contacts:
            Jc_c, a0_c = _lane_contact3d_calc(c, kin)
            act = c.active[None]                       # (1, N)
            Js.append(Jc_c * act[:, None])
            a0s.append(a0_c * act)
            masks.append(jnp.broadcast_to(c.active[None], (c.nc, N)))
        Jc = lcat(Js, 0)                               # (nc, nv, N)
        a0 = lcat(a0s, 0)                              # (nc, N)
        mask = lcat(masks, 0)                          # (nc, N)

        Lm = lchol(M)
        rhs = lcat([jnp.swapaxes(Jc, 0, 1), tau_mb[:, None]], 1)
        X = lcho_solve(Lm, rhs)
        MinvJT, a_free = X[:, :nc], X[:, nc]
        S_kkt = lmm_chunk(Jc, MinvJT, chunk=6)
        S_kkt = (S_kkt * (mask[:, None] * mask[None, :])
                 + leye(nc, mask) * (1.0 - mask)[:, None])
        if seg.kkt_damping:
            S_kkt = S_kkt + seg.kkt_damping * leye(nc, mask) \
                * (mask[:, None] * mask[None, :])
        b_lam = -(lmv(Jc, a_free) + a0) * mask
        Ls = lchol(S_kkt)
        lam = lcho_solve_vec(Ls, b_lam)
        a = a_free + lmv(MinvJT, lam)

        # external wrenches (world, about origin) per body from λ
        ext_acc = [None] * len(model.joint_types)
        i0 = 0
        for c in contacts:
            lam_c = lam[i0:i0 + c.nc]
            i0 += c.nc
            wrench = (lcat([lam_c, jnp.zeros((3, N), dtt)], 0)
                      if c.nc == 3 else lam_c)
            w_w = kin.frame_placement(c.fid).act_force(wrench)
            jid = model.frame_parents[c.fid]
            ext_acc[jid] = (w_w if ext_acc[jid] is None
                            else ext_acc[jid] + w_w)
        ext_w = jnp.stack([e if e is not None else jnp.zeros((6, N), dtt)
                           for e in ext_acc])
    else:
        Lm = lchol(M)
        a = lcho_solve_vec(Lm, tau_mb)
        lam = None       # no zero-sized arrays: Mosaic requires positive dims
        ext_w = None
        mask = None

    tan_ctx = lane_tan_ctx(kin, a)

    def ft_of(fid):
        if fid not in fts:
            fts[fid] = lane_frame_tangents(kin, a, fid, tan_ctx)
        return fts[fid]

    # -- dynamics tangents -------------------------------------------------
    dG_dq, dG_dv = lane_gforce_derivatives(kin, a, ext_w, tan_ctx)
    dr1_dx = -lcat([dG_dq, dG_dv], 1)                  # (nv, ndx, N)

    r1_all = lcat([dr1_dx, dtau_du], 1)                # (nv, ndx+nu, N)
    if nc:
        r2x_parts = [jnp.swapaxes(_lane_contact3d_tangent(c, kin, ft_of(c.fid)),
                                  0, 1) * c.active[None, None]
                     for c in contacts]                # each (nc_c, ndx, N)
        r2_all = lcat([lcat(r2x_parts, 0),
                       jnp.zeros((nc, nu, N), dtt)], 1)
        Minv_r1 = lcho_solve(Lm, r1_all)
        dlam = lcho_solve(
            Ls, (r2_all - lmm_chunk(Jc, Minv_r1, chunk=6)) * mask[:, None])
        dacc = Minv_r1 + lmm_chunk(MinvJT, dlam, chunk=6)
    else:
        dacc = lcho_solve(Lm, r1_all)
        dlam = None
    da_dx, da_du = dacc[:, :ndx], dacc[:, ndx:]

    # -- per-cost residuals, Jacobians, Gauss-Newton -----------------------
    slices = []
    i0 = 0
    for c in contacts:
        slices.append((i0, c.nc))
        i0 += c.nc

    cost_rate = jnp.zeros((N,), dtt)
    Lx = jnp.zeros((ndx, N), dtt)
    Lu = jnp.zeros((nu, N), dtt)
    Lxx = jnp.zeros((ndx, ndx, N), dtt)
    Lxu = jnp.zeros((ndx, nu, N), dtt)
    Luu = jnp.zeros((nu, nu, N), dtt)

    com_jac = None
    for citem in seg.costs.items:
        Ru_c = None                                    # None == known zero
        Rf_c = None
        if isinstance(citem, CostState):
            # structured GN: Rx = blockdiag(Jri_ff (6x6), I_{ndx-6}) — the
            # dense (nr x ndx) contraction would waste ~nr*ndx^2 MACs/node
            R_c, d6 = _lane_state_diff(has_ff, nq, nv, citem.xref, x)
            a_val, Ar, Arr = _lane_activation(citem.activation, R_c)
            w = citem.active * citem.weight
            cost_rate = cost_rate + w * a_val
            if has_ff:
                Jri = ljac_se3_right_inv(d6)           # (6, 6, N)
                Lx = Lx + w[None] * lcat([lmtv(Jri, Ar[:6]), Ar[6:]], 0)
                TL6 = lmm(lT(Jri), Jri * Arr[:6][:, None])
                top = lcat([TL6, jnp.zeros((6, ndx - 6, N), dtt)], 1)
                diag_rest = (leye(ndx, x)[6:, 6:]
                             * Arr[6:][:, None])       # (ndx-6, ndx-6, N)
                bot = lcat([jnp.zeros((ndx - 6, 6, N), dtt), diag_rest], 1)
                Lxx = Lxx + w[None, None] * lcat([top, bot], 0)
            else:
                Lx = Lx + w[None] * Ar
                Lxx = Lxx + w[None, None] * (leye(ndx, x) * Arr[:, None])
            continue
        elif isinstance(citem, CostControl):
            # Rx = 0, Ru = I: GN collapses to diagonal u-terms
            R_c = u - citem.uref
            a_val, Ar, Arr = _lane_activation(citem.activation, R_c)
            w = citem.active * citem.weight
            cost_rate = cost_rate + w * a_val
            Lu = Lu + w[None] * Ar
            Luu = Luu + w[None, None] * (leye(nu, u) * Arr[:, None])
            continue
        elif isinstance(citem, CostCoM):
            R_c = kin.com() - citem.cref
            if com_jac is None:
                com_jac = _lane_com_jac(kin)
            Rx_c = com_jac
        elif isinstance(citem, CostFrameTranslation):
            R_c = kin.frame_placement(citem.fid).p - citem.pref
            Rx_c = jnp.swapaxes(ft_of(citem.fid).dp, 0, 1)
        elif isinstance(citem, CostFrameVelocity):
            R_c = kin.frame_velocity(citem.fid) - citem.vref
            Rx_c = jnp.swapaxes(ft_of(citem.fid).dv, 0, 1)
        elif isinstance(citem, CostContactFrictionCone):
            i0c, nc_c = slices[citem.contact_idx]
            f3 = lam[i0c:i0c + 3]
            A = citem.cone.A                           # (na, 3, N)
            R_c = lmv(A, f3)
            na = A.shape[0]
            Rx_c = jnp.zeros((na, ndx, N), dtt)
            # zero-width zeros blocks break Mosaic (vector sizes must be
            # positive): only concatenate the non-empty padding parts
            Rf_parts = []
            if i0c:
                Rf_parts.append(jnp.zeros((na, i0c, N), dtt))
            Rf_parts.append(A)
            if nc - i0c - 3:
                Rf_parts.append(jnp.zeros((na, nc - i0c - 3, N), dtt))
            Rf_c = lcat(Rf_parts, 1)
        elif isinstance(citem, CostContactForce):
            i0c, nc_c = slices[citem.contact_idx]
            nrf = citem.fref.shape[0]
            R_c = lam[i0c:i0c + nrf] - citem.fref
            Rx_c = jnp.zeros((nrf, ndx, N), dtt)
            eye_np = np.zeros((nrf, nc))
            eye_np[:, i0c:i0c + nrf] = np.eye(nrf)
            Rf_c = jnp.broadcast_to(
                jnp.asarray(eye_np[:, :, None], dtt), (nrf, nc, N))
        else:  # pragma: no cover — guarded by supports()
            raise NotImplementedError(type(citem))

        if Rf_c is not None and nc:
            Rx_c = Rx_c + lmm_chunk(Rf_c, dlam[:, :ndx], chunk=6)
            Ru_fc = lmm_chunk(Rf_c, dlam[:, ndx:], chunk=6)
            Ru_c = Ru_fc if Ru_c is None else Ru_c + Ru_fc

        a_val, Ar, Arr = _lane_activation(citem.activation, R_c)
        w = citem.active * citem.weight                # (N,)
        cost_rate = cost_rate + w * a_val
        RxT = jnp.swapaxes(Rx_c, 0, 1)                 # (ndx, nr, N)
        Lx = Lx + w[None] * (Rx_c * Ar[:, None]).sum(0)
        Lxx = Lxx + w[None, None] * lmm_chunk(
            RxT, Rx_c * Arr[:, None], chunk=6)
        if Ru_c is not None:
            Lu = Lu + w[None] * (Ru_c * Ar[:, None]).sum(0)
            Lxu = Lxu + w[None, None] * lmm_chunk(
                RxT, Ru_c * Arr[:, None], chunk=6)
            Luu = Luu + w[None, None] * lmm_chunk(
                jnp.swapaxes(Ru_c, 0, 1), Ru_c * Arr[:, None], chunk=6)

    # -- Euler + manifold chain rule --------------------------------------
    dt_l = seg.dt                                      # (N,)
    dstep = lcat([v * dt_l[None] + a * (dt_l * dt_l)[None], a * dt_l[None]], 0)
    dv_ddx = jnp.asarray(np.concatenate(
        [np.zeros((nv, nv)), np.eye(nv)], axis=1)[:, :, None], dtt)
    dstep_dx = lcat([dt_l[None, None] * dv_ddx
                     + (dt_l * dt_l)[None, None] * da_dx,
                     dt_l[None, None] * da_dx], 0)     # (ndx, ndx, N)
    dstep_du = lcat([(dt_l * dt_l)[None, None] * da_du,
                     dt_l[None, None] * da_du], 0)     # (ndx, nu, N)

    if has_ff:
        xi = dstep[:6]
        eR, ep = lexp6(-xi)
        Jx_blk = lse3_adjoint(eR, ep)                  # (6, 6, N)
        Jdx_blk = ljac_se3_right(xi)
        # Fx = Jx + Jdx @ dstep_dx, with Jx/Jdx identity outside the 6x6
        # free-flyer block (jintegrate_transport structure)
        top_x = (lmm(Jdx_blk, dstep_dx[:6])
                 + lcat([Jx_blk, jnp.zeros((6, ndx - 6, N), dtt)], 1))
        bot_x = dstep_dx[6:] + leye(ndx, x)[6:]
        Fx_int = lcat([top_x, bot_x], 0)
        top_u = lmm(Jdx_blk, dstep_du[:6])
        Fu_int = lcat([top_u, dstep_du[6:]], 0)
    else:
        Fx_int = dstep_dx + leye(ndx, x)
        Fu_int = dstep_du

    # xnext = integrate(x, dstep)
    if has_ff:
        dR, dp = lexp6(dstep[:6])
        Mff = TL(lquat_to_rot(q[3:7]), q[:3])
        Mn = Mff.compose(TL(dR, dp))
        qn = lrot_to_quat(Mn.R)
        qn = qn / jnp.sqrt((qn * qn).sum(0))[None]
        q_next = lcat([Mn.p, qn, q[7:] + dstep[6:nv]], 0)
    else:
        q_next = q + dstep[:nv]
    xnext_int = lcat([q_next, v + dstep[nv:]], 0)

    is_term = (dt_l == 0.0)                            # (N,)
    Fx = jnp.where(is_term[None, None], leye(ndx, x), Fx_int)
    Fu = jnp.where(is_term[None, None], jnp.zeros_like(Fu_int), Fu_int)
    xnext = jnp.where(is_term[None], x, xnext_int)
    cost = jnp.where(is_term, cost_rate, dt_l * cost_rate)
    scale = jnp.where(is_term, jnp.ones_like(dt_l), dt_l)

    derivs = NodeDerivs(
        Fx=Fx, Fu=Fu,
        Lx=scale[None] * Lx, Lu=scale[None] * Lu,
        Lxx=scale[None, None] * Lxx, Lxu=scale[None, None] * Lxu,
        Luu=scale[None, None] * Luu)
    return derivs, xnext, cost

# ---------------------------------------------------------------------------
# Structure gate + mode configuration + leading-layout entry points
# ---------------------------------------------------------------------------

def supports(seg) -> bool:
    """True iff the stacked node model's STATIC structure is covered by the
    lane kernel (trace-time decision; unsupported structures stay on the
    generic jnp node path)."""
    from ..models.multibody.actuations import (FloatingBaseActuation,
                                               FullActuation)
    from ..models.multibody.activations import (
        ActivationQuad, ActivationQuadraticBarrier, ActivationWeightedQuad,
        ActivationWeightedQuadraticBarrier)
    from ..models.multibody.contacts import Contact3D
    from ..models.multibody.costs import (
        CostCoM, CostContactForce, CostContactFrictionCone, CostControl,
        CostFrameTranslation, CostFrameVelocity, CostState)
    from ..models.multibody.nodes import RigidBodyNode

    if not isinstance(seg, RigidBodyNode):
        return False
    if seg.integrator != "euler":
        return False
    if not isinstance(seg.actuation, (FloatingBaseActuation, FullActuation)):
        return False
    if seg.contacts is not None:
        for c in seg.contacts.contacts:
            if not isinstance(c, Contact3D):
                return False
    ok_costs = (CostCoM, CostContactForce, CostContactFrictionCone,
                CostControl, CostFrameTranslation, CostFrameVelocity,
                CostState)
    ok_acts = (ActivationQuad, ActivationQuadraticBarrier,
               ActivationWeightedQuad, ActivationWeightedQuadraticBarrier)
    for citem in seg.costs.items:
        if type(citem) not in ok_costs:
            return False
        if type(citem.activation) not in ok_acts:
            return False
    types = [JointType(t) for t in seg.state_.model.joint_types]
    if any(t == JointType.FREE_FLYER for t in types[1:]):
        return False
    return True


_MODE: Optional[str] = None


def fused_mode() -> str:
    """'off' | 'jnp' | 'pallas' | 'interpret'.  Default: 'pallas' on the TPU
    backend, 'off' elsewhere; override with CT_FUSED or set_fused_mode."""
    global _MODE
    if _MODE is None:
        env = os.environ.get("CT_FUSED", "auto")
        if env in ("0", "off"):
            _MODE = "off"
        elif env in ("jnp", "pallas", "interpret"):
            _MODE = env
        else:
            _MODE = "pallas" if jax.default_backend() == "tpu" else "off"
    return _MODE


def set_fused_mode(mode: Optional[str]):
    """Force the fused-path mode (None resets to the env/backend default)."""
    global _MODE
    _MODE = mode


def _to_lanes(tree):
    return jax.tree.map(lambda a: jnp.moveaxis(a, 0, -1), tree)


def _pad_lanes(tree, n_pad):
    """Pad the trailing node axis by replicating the last node (keeps the
    padded KKT solves well-posed; padded outputs are discarded)."""
    if n_pad == 0:
        return tree

    def pad(a):
        pads = [(0, 0)] * (a.ndim - 1) + [(0, n_pad)]
        return jnp.pad(a, pads, mode="edge")

    return jax.tree.map(pad, tree)


def _from_lanes(tree, n_keep):
    return jax.tree.map(
        lambda a: jnp.moveaxis(a[..., :n_keep], -1, 0), tree)


def calc_both_stacked(seg, xs, us, mode: Optional[str] = None):
    """Leading-node-axis entry: seg leaves (T, ...), xs (T, nx), us (T, nu)
    → (NodeDerivs (T, ...), xnexts (T, nx), costs (T,)).

    mode 'jnp' runs the lane body under plain XLA; 'pallas'/'interpret' run
    it as a Pallas kernel over NB-node blocks."""
    mode = mode or fused_mode()
    T = xs.shape[0]
    out_l = calc_both_lanes(_to_lanes(seg),
                            jnp.moveaxis(xs, 0, -1),
                            jnp.moveaxis(us, 0, -1), mode)
    return _from_lanes(out_l, T)


def calc_both_lanes(seg_l, x_l, u_l, mode: Optional[str] = None):
    """Lane-layout entry (no transposes): seg leaves (..., N), x (nx, N),
    u (nu, N) → lane-layout (NodeDerivs, xnexts (nx, N), costs (N,)).
    Used directly by the batch-native solver, which keeps everything in
    lane layout (core/solvers/fddp_batch.py)."""
    mode = mode or fused_mode()
    N0 = x_l.shape[-1]
    n_pad = (-N0) % NB
    seg_l = _pad_lanes(seg_l, n_pad)
    x_l = _pad_lanes(x_l, n_pad)
    u_l = _pad_lanes(u_l, n_pad)

    if mode == "jnp":
        out = lane_calc_both(seg_l, x_l, u_l)
        return jax.tree.map(lambda a: a[..., :N0], out)

    # ---- pallas: grid over NB-node blocks, every operand in VMEM ---------
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.MemorySpace.ANY if False else pltpu.VMEM
    except ImportError:  # pragma: no cover
        pltpu = None
        vmem = None

    Npad = N0 + n_pad
    grid = (Npad // NB,)

    seg_leaves, seg_def = jax.tree.flatten(seg_l)
    in_leaves = seg_leaves + [x_l, u_l]

    def node_spec(a):
        """Block = full leading dims x NB nodes, stepping the node axis."""
        blk = a.shape[:-1] + (NB,)
        nlead = len(blk) - 1
        kw = {}
        if vmem is not None and mode == "pallas":
            kw["memory_space"] = vmem
        return pl.BlockSpec(blk, (lambda i, _n=nlead: (0,) * _n + (i,)), **kw)

    def const_spec(a):
        """Whole-array block, same for every grid step (hoisted constants)."""
        kw = {}
        if vmem is not None and mode == "pallas":
            kw["memory_space"] = vmem
        return pl.BlockSpec(a.shape, (lambda i, _n=a.ndim: (0,) * _n), **kw)

    # Pallas kernels may not capture array constants (ancestry masks,
    # identity blocks, Cholesky column masks, ...).  Trace the block
    # computation ONCE to a jaxpr, convert its constvars into leading
    # invars, and feed the constants as ordinary kernel inputs with
    # whole-array block specs (same block every grid step).
    from jax._src import core as _score
    from jax._src.interpreters import partial_eval as _pe

    block_in = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape[:-1] + (NB,), a.dtype),
        (seg_l, x_l, u_l))
    closed = jax.make_jaxpr(
        lambda sl, xl, ul: lane_calc_both(sl, xl, ul))(*block_in)
    consts = [jnp.asarray(c) for c in closed.consts]
    body = _score.jaxpr_as_fun(
        _score.ClosedJaxpr(_pe.convert_constvars_jaxpr(closed.jaxpr), ()))

    out_shape_tree = jax.eval_shape(
        lambda sl, xl, ul: lane_calc_both(sl, xl, ul), *block_in)
    out_flat_shapes, out_def = jax.tree.flatten(out_shape_tree)
    out_flat = out_flat_shapes
    out_specs_flat = [node_spec(s) for s in out_flat]

    n_in = len(in_leaves)
    n_const = len(consts)

    # Rank-1 lane leaves (dt, weights, active flags, cost) are lifted to
    # (1, N): under vmap the batch axis is prepended to every operand, and
    # Pallas requires the last two block dims to tile (8, 128) or equal the
    # array dims — a bare (N,) block would put the batch axis in the
    # penultimate slot and fail that check.
    in_lift = [a.ndim == 1 for a in in_leaves]
    in_ops = [a[None] if l else a for a, l in zip(in_leaves, in_lift)]
    out_lift = [s.ndim == 1 for s in out_flat]

    def kernel(*refs):
        in_refs = refs[:n_in]
        const_refs = refs[n_in:n_in + n_const]
        out_refs = refs[n_in + n_const:]
        flat_in = [r[...][0] if l else r[...]
                   for r, l in zip(in_refs, in_lift)]
        flat_c = [r[...] for r in const_refs]
        outs = body(*flat_c, *flat_in)
        for r, val, l in zip(out_refs, outs, out_lift):
            r[...] = val[None] if l else val

    kw = {}
    if mode == "pallas" and pltpu is not None:
        # the fused body peaks above the 16 MB default scoped-vmem limit
        # (v5e VMEM is 128 MiB); give Mosaic room
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    def lifted_shape(s, l):
        base = ((1,) + s.shape if l else s.shape)[:-1]
        return jax.ShapeDtypeStruct(base + (Npad,), s.dtype)

    out_lanes_flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([node_spec(a) for a in in_ops]
                  + [const_spec(c) for c in consts]),
        out_specs=[node_spec(lifted_shape(s, l))
                   for s, l in zip(out_flat, out_lift)],
        out_shape=[lifted_shape(s, l)
                   for s, l in zip(out_flat, out_lift)],
        interpret=(mode == "interpret"),
        **kw,
    )(*in_ops, *consts)
    out_lanes_flat = [a[0] if l else a
                      for a, l in zip(out_lanes_flat, out_lift)]
    out_lanes = jax.tree.unflatten(out_def, out_lanes_flat)
    return jax.tree.map(lambda a: a[..., :N0], out_lanes)


def enabled_for(seg) -> bool:
    """Trace-time dispatch: fused path on iff mode != off and the structure
    is supported."""
    return fused_mode() != "off" and supports(seg)

# ---------------------------------------------------------------------------
# Primal-only lane evaluation (node calc) — used by the fused rollout kernel
# (ops/fused_scans.py); mirrors RigidBodyNode.calc / _compute
# ---------------------------------------------------------------------------

def lane_integrate(has_ff, nq, nv, x, dx):
    """state.integrate(x, dx) in lane layout: x (nx, N), dx (ndx, N)."""
    q, v = x[:nq], x[nq:]
    if has_ff:
        dR, dp = lexp6(dx[:6])
        Mff = TL(lquat_to_rot(q[3:7]), q[:3])
        Mn = Mff.compose(TL(dR, dp))
        qn = lrot_to_quat(Mn.R)
        qn = qn / jnp.sqrt((qn * qn).sum(0))[None]
        q_next = lcat([Mn.p, qn, q[7:] + dx[6:nv]], 0)
    else:
        q_next = q + dx[:nv]
    return lcat([q_next, v + dx[nv:]], 0)


def lane_calc_primal(seg, x, u):
    """(xnext (nx, N), cost (N,)) — the node primal only (calc), lane layout.

    Shares every building block with lane_calc_both but skips all tangent
    work; used per-step by the fused sequential rollout kernel where the
    T-loop lives INSIDE one Pallas kernel (the b=1 MPC latency path)."""
    from ..models.multibody.actuations import (FloatingBaseActuation,
                                               FullActuation)
    from ..models.multibody.costs import (
        CostCoM, CostContactForce, CostContactFrictionCone, CostControl,
        CostFrameTranslation, CostFrameVelocity, CostState)

    st = seg.state_
    model = st.model
    meta = algo._tree_meta(tuple(model.parents), tuple(model.joint_types),
                           tuple(model.frame_parents))
    nq, nv = st.nq, st.nv
    dtt = x.dtype
    N = x.shape[-1]
    has_ff = JointType(model.joint_types[0]) == JointType.FREE_FLYER

    q, v = x[:nq], x[nq:]
    kin = lane_kin(model, meta, q, v)
    if isinstance(seg.actuation, FloatingBaseActuation):
        tau = lcat([jnp.zeros((6, N), dtt), u], 0)
    elif isinstance(seg.actuation, FullActuation):
        tau = u
    else:  # pragma: no cover — guarded by supports()
        raise NotImplementedError(type(seg.actuation))

    M = lane_mass_matrix(kin, seg.armature)
    b = lane_bias_forces(kin)
    tau_mb = tau - b
    contacts = (tuple(seg.contacts.contacts)
                if seg.contacts is not None else ())
    nc = sum(c.nc for c in contacts)

    if nc:
        Js, a0s, masks = [], [], []
        for c in contacts:
            Jc_c, a0_c = _lane_contact3d_calc(c, kin)
            act = c.active[None]
            Js.append(Jc_c * act[:, None])
            a0s.append(a0_c * act)
            masks.append(jnp.broadcast_to(c.active[None], (c.nc, N)))
        Jc = lcat(Js, 0)
        a0 = lcat(a0s, 0)
        mask = lcat(masks, 0)
        Lm = lchol(M)
        rhs = lcat([jnp.swapaxes(Jc, 0, 1), tau_mb[:, None]], 1)
        X = lcho_solve(Lm, rhs)
        MinvJT, a_free = X[:, :nc], X[:, nc]
        S_kkt = lmm_chunk(Jc, MinvJT, chunk=6)
        S_kkt = (S_kkt * (mask[:, None] * mask[None, :])
                 + leye(nc, mask) * (1.0 - mask)[:, None])
        if seg.kkt_damping:
            S_kkt = S_kkt + seg.kkt_damping * leye(nc, mask) \
                * (mask[:, None] * mask[None, :])
        b_lam = -(lmv(Jc, a_free) + a0) * mask
        Ls = lchol(S_kkt)
        lam = lcho_solve_vec(Ls, b_lam)
        a = a_free + lmv(MinvJT, lam)
    else:
        Lm = lchol(M)
        a = lcho_solve_vec(Lm, tau_mb)
        lam = None

    slices = []
    i0 = 0
    for c in contacts:
        slices.append((i0, c.nc))
        i0 += c.nc

    cost_rate = jnp.zeros((N,), dtt)
    for citem in seg.costs.items:
        if isinstance(citem, CostState):
            R_c, _ = _lane_state_diff(has_ff, nq, nv, citem.xref, x)
        elif isinstance(citem, CostControl):
            R_c = u - citem.uref
        elif isinstance(citem, CostCoM):
            R_c = kin.com() - citem.cref
        elif isinstance(citem, CostFrameTranslation):
            R_c = kin.frame_placement(citem.fid).p - citem.pref
        elif isinstance(citem, CostFrameVelocity):
            R_c = kin.frame_velocity(citem.fid) - citem.vref
        elif isinstance(citem, CostContactFrictionCone):
            i0c, _ = slices[citem.contact_idx]
            R_c = lmv(citem.cone.A, lam[i0c:i0c + 3])
        elif isinstance(citem, CostContactForce):
            i0c, _ = slices[citem.contact_idx]
            nrf = citem.fref.shape[0]
            R_c = lam[i0c:i0c + nrf] - citem.fref
        else:  # pragma: no cover — guarded by supports()
            raise NotImplementedError(type(citem))
        a_val, _, _ = _lane_activation(citem.activation, R_c)
        cost_rate = cost_rate + citem.active * citem.weight * a_val

    dt_l = seg.dt
    dstep = lcat([v * dt_l[None] + a * (dt_l * dt_l)[None],
                  a * dt_l[None]], 0)
    xnext_int = lane_integrate(has_ff, nq, nv, x, dstep)
    is_term = (dt_l == 0.0)
    xnext = jnp.where(is_term[None], x, xnext_int)
    cost = jnp.where(is_term, cost_rate, dt_l * cost_rate)
    return xnext, cost
