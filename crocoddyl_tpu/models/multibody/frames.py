"""Friction cone and CoP support-region inequality carriers.

Reference: multibody/friction-cone.hxx:55-100 (linearized cone: nf facet rows
(−µ·e_z ± t_i)ᵀ·R_cone with ub=0, plus a normal-force row with
[min,max]-force bounds) and multibody/frames.hpp:158-203 (FrameCoPSupport:
4×6 matrix A with A·f ≥ 0 keeping the CoP inside the support rectangle —
the fork's thesis contribution).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct


def _rot_from_two_vectors(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix sending a → b (numpy, build-time)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        if c > 0:
            return np.eye(3)
        # opposite: rotate π about any orthogonal axis
        axis = np.array([1.0, 0.0, 0.0])
        if abs(a[0]) > 0.9:
            axis = np.array([0.0, 1.0, 0.0])
        v = np.cross(a, axis)
        v /= np.linalg.norm(v)
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        return np.eye(3) + 2.0 * K @ K
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * (1.0 / (1.0 + c))


class FrictionCone(struct.PyTreeNode):
    """Linearized friction cone: A·f with lb ≤ A·f ≤ ub."""

    A: jax.Array    # (nf+1, 3)
    lb: jax.Array   # (nf+1,)
    ub: jax.Array   # (nf+1,)

    @property
    def nr(self) -> int:
        return self.A.shape[0]


def friction_cone(normal=(0.0, 0.0, 1.0), mu: float = 0.7, nf: int = 4,
                  inner_appr: bool = True, min_nforce: float = 0.0,
                  max_nforce: float = np.inf, dtype=np.float64) -> FrictionCone:
    """Build per friction-cone.hxx:55-100."""
    normal = np.asarray(normal, dtype)
    normal = normal / np.linalg.norm(normal)
    theta = 2.0 * np.pi / nf
    mu_eff = mu * np.cos(theta / 2.0) if inner_appr else mu
    c_R_o = _rot_from_two_vectors(normal, np.array([0.0, 0.0, 1.0]))
    A = np.zeros((nf + 1, 3), dtype)
    lb = np.zeros((nf + 1,), dtype)
    ub = np.zeros((nf + 1,), dtype)
    for i in range(nf // 2):
        t_i = theta * i
        tsurf = np.array([np.cos(t_i), np.sin(t_i), 0.0])
        A[2 * i] = (-mu_eff * np.array([0.0, 0.0, 1.0]) + tsurf) @ c_R_o
        A[2 * i + 1] = (-mu_eff * np.array([0.0, 0.0, 1.0]) - tsurf) @ c_R_o
        lb[2 * i] = lb[2 * i + 1] = -np.inf
        ub[2 * i] = ub[2 * i + 1] = 0.0
    A[nf] = normal
    lb[nf] = min_nforce
    ub[nf] = max_nforce
    return FrictionCone(A=jnp.asarray(A), lb=jnp.asarray(lb), ub=jnp.asarray(ub))


class CoPSupport(struct.PyTreeNode):
    """A·f ≥ 0 keeps the CoP inside the (length × width) support rectangle
    (frames.hpp:182-187, eq. 18-19 of Kleff et al.)."""

    A: jax.Array  # (4, 6)


def cop_support(length: float, width: float, dtype=np.float64) -> CoPSupport:
    A = np.array([
        [0, 0, length / 2.0, 0, -1, 0],
        [0, 0, length / 2.0, 0, 1, 0],
        [0, 0, width / 2.0, 1, 0, 0],
        [0, 0, width / 2.0, -1, 0, 0],
    ], dtype)
    return CoPSupport(A=jnp.asarray(A))
