"""SO(3)/SE(3) Lie-group operations, AD-safe at singularities.

These replace the Pinocchio manifold substrate used by the reference
(pinocchio::integrate/difference/dIntegrate/dDifference, exp/log maps; see
reference include/crocoddyl/multibody/states/multibody.hxx:54-144).
Conventions: quaternions stored (x, y, z, w) [Pinocchio order]; spatial
motions ordered [linear; angular]; SE(3) exp/log follow M ⊕ v = M·exp6(v)
with v expressed in the body frame.

All branches use the masked-input ("double where") pattern so that forward
*and* reverse/forward-mode derivatives are NaN-free at θ=0 and θ=π: the
argument of any singular expression is replaced by a safe constant where the
Taylor branch is selected, so the non-taken branch never produces NaN in the
gradient path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS2 = 1e-14   # θ² threshold for Taylor branches


def mm(A, B):
    """Batched matmul without dot_general (broadcast-multiply-reduce):
    tiny 3×3 products belong on the VPU, and dot_general with stacked vmap
    batch dims trips an XLA simplification verifier bug."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def mv(A, x):
    """Batched matvec (..., m, k) x (..., k) -> (..., m) without dot."""
    return (A * x[..., None, :]).sum(-1)


def mtv(A, x):
    """Batched matvec with the transpose: Aᵀ x."""
    return (A * x[..., :, None]).sum(-2)



def skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def unskew(m):
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _theta(w):
    """(theta2, theta_safe, small): θ²; θ masked to 1 where small."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS2
    t2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    return theta2, jnp.sqrt(t2_safe), small


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float64):
    return jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_to_rot(q):
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)


def rot_to_quat(R):
    """Rotation matrix → quaternion (x, y, z, w), w >= 0 (branchless Shepperd)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    q0 = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                    R[..., 0, 2] - R[..., 2, 0],
                    R[..., 1, 0] - R[..., 0, 1],
                    1.0 + tr], axis=-1)
    q1 = jnp.stack([1.0 + R[..., 0, 0] - R[..., 1, 1] - R[..., 2, 2],
                    R[..., 0, 1] + R[..., 1, 0],
                    R[..., 0, 2] + R[..., 2, 0],
                    R[..., 2, 1] - R[..., 1, 2]], axis=-1)
    q2 = jnp.stack([R[..., 0, 1] + R[..., 1, 0],
                    1.0 - R[..., 0, 0] + R[..., 1, 1] - R[..., 2, 2],
                    R[..., 1, 2] + R[..., 2, 1],
                    R[..., 0, 2] - R[..., 2, 0]], axis=-1)
    q3 = jnp.stack([R[..., 0, 2] + R[..., 2, 0],
                    R[..., 1, 2] + R[..., 2, 1],
                    1.0 - R[..., 0, 0] - R[..., 1, 1] + R[..., 2, 2],
                    R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    norms2 = jnp.sum(cands * cands, axis=-1)
    idx = jnp.argmax(norms2, axis=-1)
    sel = jnp.take_along_axis(
        cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1),
        axis=-2)[..., 0, :]
    q = sel / jnp.linalg.norm(sel, axis=-1, keepdims=True)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quat_exp(w3):
    """Quaternion of the rotation exp3(w3)."""
    theta2, theta, small = _theta(w3)
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w3 * sinc_half[..., None], w[..., None]], axis=-1)


def quat_log(q):
    """Rotation vector of unit quaternion q (principal branch)."""
    vec, w = q[..., :3], q[..., 3]
    sgn = jnp.where(w < 0, -1.0, 1.0)           # hemisphere w >= 0
    vec, w = vec * sgn[..., None], w * sgn
    n2 = jnp.sum(vec * vec, axis=-1)
    small = n2 < _EPS2
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    angle = 2.0 * jnp.arctan2(n, w)
    # scale = angle/n; Taylor in n: 2/w · (1 − n²/(3w²))
    scale = jnp.where(small, 2.0 / w - 2.0 * n2 / (3.0 * w ** 3), angle / n)
    return vec * scale[..., None]


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def exp3(w):
    """Rotation matrix exp([w]×) (Rodrigues, Taylor-safe)."""
    theta2, theta, small = _theta(w)
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + s[..., None, None] * W + c[..., None, None] * mm(W, W)


def log3(R):
    """Rotation vector of R — via the quaternion atan2 form (accurate and
    AD-safe at both θ=0 and θ≈π)."""
    return quat_log(rot_to_quat(R))


def jac_so3_right(w):
    """Right Jacobian Jr of SO(3): exp(w + dw) ≈ exp(w)·exp(Jr·dw)."""
    theta2, theta, small = _theta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / t2)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - jnp.sin(theta)) / (t2 * theta))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - c1[..., None, None] * W + c2[..., None, None] * mm(W, W)


def jac_so3_right_inv(w):
    theta2, theta, small = _theta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  1.0 / t2 - (1.0 + jnp.cos(theta))
                  / (2.0 * theta * jnp.sin(theta)))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + 0.5 * W + c[..., None, None] * mm(W, W)


# ---------------------------------------------------------------------------
# SE(3): elements as (R (3,3), p (3,)); tangent [v_lin; w_ang] (body frame)
# ---------------------------------------------------------------------------

def se3_v_matrix(w):
    """V(w) with exp6([v;w]) translation part = V(w)·v."""
    theta2, theta, small = _theta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / t2)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - jnp.sin(theta)) / (t2 * theta))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + c1[..., None, None] * W + c2[..., None, None] * mm(W, W)


def se3_v_inv(w):
    theta2, theta, small = _theta(w)
    t2 = jnp.where(small, 1.0, theta2)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  1.0 / t2 - (1.0 + jnp.cos(theta))
                  / (2.0 * theta * jnp.sin(theta)))
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + c[..., None, None] * mm(W, W)


def exp6(xi):
    """SE(3) exponential of [v; w] → (R, p)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = exp3(w)
    p = mv(se3_v_matrix(w), v)
    return R, p


def log6(R, p):
    """[v; w] = log of SE(3) element (R, p)."""
    w = log3(R)
    v = mv(se3_v_inv(w), p)
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) Jacobians (closed form) — replace the AD-default jdiff/jintegrate of
# StateBase for multibody states (reference: pinocchio dIntegrate/dDifference
# used by multibody/states/multibody.hxx:94-144).
# ---------------------------------------------------------------------------

def se3_adjoint(R, p):
    """Ad(M): [v';w'] = Ad·[v;w] maps body-frame motions through M
    (tangent order [linear; angular]): Ad = [[R, p^R], [0, R]]."""
    pR = mm(skew(p), R)
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, pR], axis=-1)
    bot = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _se3_Q_left(v, w):
    """Q block of the SE(3) LEFT Jacobian (Barfoot, State Estimation for
    Robotics, eq. 7.86; tangent [ρ; φ] = our [v; w]), Taylor-safe."""
    theta2, theta, small = _theta(w)
    t2 = jnp.where(small, 1.0, theta2)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # (θ−sinθ)/θ³ ;  (1 − θ²/2 − cosθ)/θ⁴ ;  (θ − sinθ − θ³/6)/θ⁵
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                   (theta - sin_t) / (t2 * theta))
    m2 = jnp.where(small, -1.0 / 24.0 + theta2 / 720.0,
                   (1.0 - 0.5 * theta2 - cos_t) / (t2 * t2))
    m3 = jnp.where(small, -1.0 / 120.0 + theta2 / 5040.0,
                   (theta - sin_t - theta2 * theta / 6.0)
                   / (t2 * t2 * theta))
    V = skew(v)
    W = skew(w)
    WV, VW = mm(W, V), mm(V, W)
    WVW = mm(WV, W)
    WWV, VWW = mm(W, WV), mm(VW, W)
    WVWW = mm(WVW, W)
    WWVW = mm(W, WVW)
    return (0.5 * V
            + c1[..., None, None] * (WV + VW + WVW)
            - m2[..., None, None] * (WWV + VWW - 3.0 * WVW)
            - 0.5 * (m2 - 3.0 * m3)[..., None, None] * (WVWW + WWVW))


def jac_se3_left(xi):
    """SE(3) left Jacobian Jl6: exp6(ξ+δ) ≈ exp6(Jl6·δ)·exp6(ξ)."""
    v, w = xi[..., :3], xi[..., 3:]
    Jl = se3_v_matrix(w)                     # = Jl3(w)
    Q = _se3_Q_left(v, w)
    z = jnp.zeros_like(Jl)
    top = jnp.concatenate([Jl, Q], axis=-1)
    bot = jnp.concatenate([z, Jl], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def jac_se3_right(xi):
    """SE(3) right Jacobian Jr6: exp6(ξ+δ) ≈ exp6(ξ)·exp6(Jr6·δ);
    Jr6(ξ) = Jl6(−ξ)."""
    return jac_se3_left(-xi)


def jac_se3_right_inv(xi):
    """Jr6(ξ)⁻¹ = [[Jr3⁻¹, −Jr3⁻¹·Q_r·Jr3⁻¹], [0, Jr3⁻¹]].

    This is Jlog6 at D = exp6(ξ): log6(D·exp6(δ)) ≈ ξ + Jr6⁻¹(ξ)·δ."""
    v, w = xi[..., :3], xi[..., 3:]
    Jri = jac_so3_right_inv(w)               # = Jl3(−w)⁻¹
    Qr = _se3_Q_left(-v, -w)
    QJ = mm(Qr, Jri)
    top_r = -mm(Jri, QJ)
    z = jnp.zeros_like(Jri)
    top = jnp.concatenate([Jri, top_r], axis=-1)
    bot = jnp.concatenate([z, Jri], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
