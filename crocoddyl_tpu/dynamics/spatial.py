"""6D spatial algebra (Featherstone), [linear; angular] ordering.

This is the Eigen/Pinocchio substrate replacement (reference L1; SURVEY §1).
A spatial transform is (R, p): rotation ``A_R_B`` plus origin of B expressed
in A.  Motions/forces are 6-vectors [lin; ang].  Spatial inertia is stored as
(mass m, com lever c, rotational inertia about the com I_c).

Everything is batched: leading axes broadcast.  Small (3×3) products are
deliberately written as broadcast-multiply-reduce (``mm``/``mv``) rather
than ``einsum``/``@``: tiny matmuls belong on the VPU, not the MXU, and
dot_general with several stacked vmap batch dimensions trips an XLA
simplification-pass verifier bug (observed on both CPU and TPU backends
under vmap∘vmap∘jacfwd).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lie import mm, mtv, mv, skew




class Transform(NamedTuple):
    """X = (R, p): frame B expressed in frame A."""
    R: jnp.ndarray  # (..., 3, 3)
    p: jnp.ndarray  # (..., 3)

    def compose(self, other: "Transform") -> "Transform":
        """A_X_B ∘ B_X_C = A_X_C."""
        return Transform(mm(self.R, other.R), self.p + mv(self.R, other.p))

    def inverse(self) -> "Transform":
        RT = jnp.swapaxes(self.R, -1, -2)
        return Transform(RT, -mv(RT, self.p))

    def act_motion(self, m) -> jnp.ndarray:
        """Motion expressed in B → expressed in A."""
        lin, ang = m[..., :3], m[..., 3:]
        Rl = mv(self.R, lin)
        Ra = mv(self.R, ang)
        return jnp.concatenate([Rl + jnp.cross(self.p, Ra), Ra], axis=-1)

    def act_motion_inv(self, m) -> jnp.ndarray:
        """Motion expressed in A → expressed in B."""
        lin, ang = m[..., :3], m[..., 3:]
        a = mtv(self.R, ang)
        l = mtv(self.R, lin - jnp.cross(self.p, ang))
        return jnp.concatenate([l, a], axis=-1)

    def act_force(self, f) -> jnp.ndarray:
        """Force expressed in B → expressed in A."""
        lin, ang = f[..., :3], f[..., 3:]
        Rl = mv(self.R, lin)
        Ra = mv(self.R, ang)
        return jnp.concatenate([Rl, Ra + jnp.cross(self.p, Rl)], axis=-1)

    def act_force_inv(self, f) -> jnp.ndarray:
        """Force expressed in A → expressed in B."""
        lin, ang = f[..., :3], f[..., 3:]
        l = mtv(self.R, lin)
        a = mtv(self.R, ang - jnp.cross(self.p, lin))
        return jnp.concatenate([l, a], axis=-1)

    def act_point(self, x) -> jnp.ndarray:
        return self.p + mv(self.R, x)


def transform_identity(dtype=jnp.float64, batch=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    p = jnp.zeros(batch + (3,), dtype)
    return Transform(R, p)


def cross_motion(v, m):
    """v × m for motions (both [lin; ang])."""
    vl, w = v[..., :3], v[..., 3:]
    ml, ma = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ml) + jnp.cross(vl, ma), jnp.cross(w, ma)], axis=-1)


def cross_force(v, f):
    """v ×* f for a motion v and force f."""
    vl, w = v[..., :3], v[..., 3:]
    fl, n = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fl), jnp.cross(w, n) + jnp.cross(vl, fl)], axis=-1)


class Inertia(NamedTuple):
    """Spatial inertia: mass, com lever c (in the body/joint frame), and
    rotational inertia about the com I_c."""
    m: jnp.ndarray   # (...,)
    c: jnp.ndarray   # (..., 3)
    I_c: jnp.ndarray  # (..., 3, 3)

    def to_matrix(self) -> jnp.ndarray:
        """Dense 6×6 spatial inertia about the frame origin, [lin; ang]."""
        cx = skew(self.c)
        m = self.m[..., None, None]
        eye = jnp.eye(3, dtype=self.c.dtype)
        I_bar = self.I_c - m * mm(cx, cx)
        top = jnp.concatenate([m * eye, -m * cx], axis=-1)
        bot = jnp.concatenate([m * cx, I_bar], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def mul_motion(self, v) -> jnp.ndarray:
        """f = I·v (momentum of motion v)."""
        vl, w = v[..., :3], v[..., 3:]
        m = self.m[..., None]
        cx = skew(self.c)
        fl = m * (vl - jnp.cross(self.c, w))
        fa = (m * jnp.cross(self.c, vl)
              + mv(self.I_c, w)
              - m * mv(cx, mv(cx, w)))
        return jnp.concatenate([fl, fa], axis=-1)
