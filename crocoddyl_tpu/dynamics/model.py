"""Kinematic-tree robot model — the Pinocchio model replacement.

A :class:`RobotModel` is a pytree dataclass: the tree *structure* (joint
types, parents, dimensions, frame attachments) is static metadata hashable at
trace time; the *numbers* (joint placements, inertias, axes, limits) are
array leaves, so a whole fleet of robots with the same topology batches under
vmap.

Configuration layout (Pinocchio conventions; reference uses
pinocchio::ModelTpl): free-flyer contributes (x y z | qx qy qz qw) to q and
[lin; ang] body-frame velocity to v; revolute/prismatic contribute 1 dof.
"""

from __future__ import annotations

import enum
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import lie
from .spatial import Inertia, Transform


class JointType(enum.IntEnum):
    FREE_FLYER = 0
    REVOLUTE = 1
    PRISMATIC = 2


_NQ = {JointType.FREE_FLYER: 7, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1}
_NV = {JointType.FREE_FLYER: 6, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1}


class RobotModel(struct.PyTreeNode):
    # -- static structure ------------------------------------------------
    joint_types: Tuple[int, ...] = struct.field(pytree_node=False)
    parents: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 = world
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)
    frame_names: Tuple[str, ...] = struct.field(pytree_node=False)
    frame_parents: Tuple[int, ...] = struct.field(pytree_node=False)  # joint idx

    # -- numeric parameters (array leaves) -------------------------------
    jp_R: jax.Array      # (nj, 3, 3) joint placement rotation in parent frame
    jp_p: jax.Array      # (nj, 3) joint placement translation
    axis: jax.Array      # (nj, 3) motion axis (revolute/prismatic; unused FF)
    mass: jax.Array      # (nj,)
    com: jax.Array       # (nj, 3) body com in joint frame
    inertia: jax.Array   # (nj, 3, 3) rotational inertia about the com
    fp_R: jax.Array      # (nf, 3, 3) frame placement in parent joint frame
    fp_p: jax.Array      # (nf, 3)
    gravity: jax.Array   # (3,)
    # limits (from URDF; reference multibody.hxx:25-35)
    q_lb: jax.Array      # (nq,)
    q_ub: jax.Array      # (nq,)
    v_limit: jax.Array   # (nv,)
    effort_limit: jax.Array  # (nv,)

    # -- derived static dims ---------------------------------------------
    @property
    def njoints(self) -> int:
        return len(self.joint_types)

    @property
    def nq(self) -> int:
        return sum(_NQ[JointType(t)] for t in self.joint_types)

    @property
    def nv(self) -> int:
        return sum(_NV[JointType(t)] for t in self.joint_types)

    @property
    def nframes(self) -> int:
        return len(self.frame_names)

    def q_slices(self):
        out, i = [], 0
        for t in self.joint_types:
            n = _NQ[JointType(t)]
            out.append((i, n))
            i += n
        return tuple(out)

    def v_slices(self):
        out, i = [], 0
        for t in self.joint_types:
            n = _NV[JointType(t)]
            out.append((i, n))
            i += n
        return tuple(out)

    def frame_id(self, name: str) -> int:
        return self.frame_names.index(name)

    # -- neutral / random configurations ---------------------------------
    def neutral(self, dtype=None) -> jax.Array:
        dtype = dtype or self.jp_p.dtype
        parts = []
        for t in self.joint_types:
            if JointType(t) == JointType.FREE_FLYER:
                parts.append(jnp.concatenate([jnp.zeros((3,), dtype),
                                              lie.quat_identity(dtype)]))
            else:
                parts.append(jnp.zeros((1,), dtype))
        return jnp.concatenate(parts)

    def random_q(self, key, dtype=None) -> jax.Array:
        dtype = dtype or self.jp_p.dtype
        parts = []
        for t in self.joint_types:
            key, k = jax.random.split(key)
            if JointType(t) == JointType.FREE_FLYER:
                kp, kq = jax.random.split(k)
                p = jax.random.uniform(kp, (3,), dtype, -1.0, 1.0)
                quat = lie.quat_normalize(
                    jax.random.normal(kq, (4,), dtype))
                parts.append(jnp.concatenate([p, quat]))
            else:
                parts.append(jax.random.uniform(k, (1,), dtype, -jnp.pi, jnp.pi))
        return jnp.concatenate(parts)


class ModelBuilder:
    """Imperative builder (numpy) that freezes into a RobotModel pytree."""

    def __init__(self, gravity=(0.0, 0.0, -9.81), dtype=np.float64):
        self.dtype = dtype
        self.joint_types, self.parents, self.joint_names = [], [], []
        self.jp_R, self.jp_p, self.axis = [], [], []
        self.mass, self.com, self.inertia = [], [], []
        self.frame_names, self.frame_parents = [], []
        self.fp_R, self.fp_p = [], []
        self.q_lb, self.q_ub, self.v_limit, self.effort_limit = [], [], [], []
        self.gravity = np.asarray(gravity, dtype)

    def add_joint(self, jtype: JointType, parent: int, name: str,
                  placement_R=None, placement_p=None, axis=(0.0, 0.0, 1.0),
                  mass=1.0, com=(0.0, 0.0, 0.0), inertia=None,
                  q_lim: Optional[Tuple[float, float]] = None,
                  v_lim: float = np.inf, effort_lim: float = np.inf) -> int:
        """Add a joint + its attached body; returns joint index."""
        self.joint_types.append(int(jtype))
        self.parents.append(parent)
        self.joint_names.append(name)
        self.jp_R.append(np.eye(3, dtype=self.dtype)
                         if placement_R is None else np.asarray(placement_R))
        self.jp_p.append(np.zeros(3, dtype=self.dtype)
                         if placement_p is None else np.asarray(placement_p))
        a = np.asarray(axis, self.dtype)
        self.axis.append(a / np.linalg.norm(a))
        self.mass.append(mass)
        self.com.append(np.asarray(com, self.dtype))
        if inertia is None:
            inertia = 0.1 * np.eye(3)
        inertia = np.asarray(inertia, self.dtype)
        if inertia.ndim == 1:
            inertia = np.diag(inertia)
        self.inertia.append(inertia)
        nqj = _NQ[jtype]
        nvj = _NV[jtype]
        if jtype == JointType.FREE_FLYER:
            # free-flyer position limits are ±∞ (reference multibody.hxx:25-35)
            self.q_lb += [-np.inf] * 7
            self.q_ub += [np.inf] * 7
        else:
            lo, hi = (q_lim if q_lim is not None else (-np.inf, np.inf))
            self.q_lb += [lo] * nqj
            self.q_ub += [hi] * nqj
        self.v_limit += [v_lim] * nvj
        self.effort_limit += [effort_lim] * nvj
        return len(self.joint_types) - 1

    def add_frame(self, name: str, parent_joint: int,
                  placement_R=None, placement_p=None) -> int:
        self.frame_names.append(name)
        self.frame_parents.append(parent_joint)
        self.fp_R.append(np.eye(3, dtype=self.dtype)
                         if placement_R is None else np.asarray(placement_R))
        self.fp_p.append(np.zeros(3, dtype=self.dtype)
                         if placement_p is None else np.asarray(placement_p))
        return len(self.frame_names) - 1

    def build(self) -> RobotModel:
        nf = max(len(self.frame_names), 1)
        fp_R = self.fp_R or [np.eye(3, dtype=self.dtype)]
        fp_p = self.fp_p or [np.zeros(3, dtype=self.dtype)]
        fnames = tuple(self.frame_names) or ("__world__",)
        fparents = tuple(self.frame_parents) or (0,)
        return RobotModel(
            joint_types=tuple(self.joint_types),
            parents=tuple(self.parents),
            joint_names=tuple(self.joint_names),
            frame_names=fnames,
            frame_parents=fparents,
            jp_R=jnp.asarray(np.stack(self.jp_R)),
            jp_p=jnp.asarray(np.stack(self.jp_p)),
            axis=jnp.asarray(np.stack(self.axis)),
            mass=jnp.asarray(np.asarray(self.mass, self.dtype)),
            com=jnp.asarray(np.stack(self.com)),
            inertia=jnp.asarray(np.stack(self.inertia)),
            fp_R=jnp.asarray(np.stack(fp_R)),
            fp_p=jnp.asarray(np.stack(fp_p)),
            gravity=jnp.asarray(self.gravity),
            q_lb=jnp.asarray(np.asarray(self.q_lb, self.dtype)),
            q_ub=jnp.asarray(np.asarray(self.q_ub, self.dtype)),
            v_limit=jnp.asarray(np.asarray(self.v_limit, self.dtype)),
            effort_limit=jnp.asarray(np.asarray(self.effort_limit, self.dtype)),
        )
