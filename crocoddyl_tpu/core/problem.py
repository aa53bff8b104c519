"""Shooting problem container.

Reference: include/crocoddyl/core/optctrl/shooting.hpp:31-223.  The reference
holds T heterogeneous model pointers + preallocated Datas and loops (OpenMP)
over nodes in ``calc``/``calcDiff``; rollout is sequential.  Here the running
horizon is ONE model dataclass whose array leaves carry a leading T axis
(per-node parameters), so node evaluation is a ``jax.vmap`` over T — the exact
TPU analogue of the OpenMP node loop — and the rollout is a ``lax.scan``.

Heterogeneous node TYPES (e.g. RigidBodyNode running knots interleaved with
ImpulseNode foot-switch knots, the reference's true-impulse gait variant,
utils/quadruped.py:523-554) are expressed as SEGMENTS: ``running`` may be a
tuple of stacked models, evaluated as consecutive vmaps/scans.  All segments
must share the state and nu so the stacked derivative arrays stay uniform and
the Riccati recursion is segment-agnostic.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .action import ActionModel, NodeDerivs


def _seg_len(model) -> int:
    return jax.tree.leaves(model)[0].shape[0]


def _concat_tree(trees):
    if len(trees) == 1:
        return trees[0]
    return jax.tree.map(lambda *ls: jnp.concatenate(ls, axis=0), *trees)


class ShootingProblem(struct.PyTreeNode):
    x0: jax.Array
    running: Any           # stacked model, or tuple of stacked segments
    terminal: ActionModel

    @property
    def segments(self) -> Tuple[ActionModel, ...]:
        return (self.running if isinstance(self.running, tuple)
                else (self.running,))

    @property
    def seg_lengths(self) -> Tuple[int, ...]:
        return tuple(_seg_len(s) for s in self.segments)

    @property
    def T(self) -> int:
        return sum(self.seg_lengths)

    @property
    def state(self):
        return self.terminal.state

    @property
    def nu(self) -> int:
        return self.segments[0].nu

    def _seg_slices(self):
        out, i = [], 0
        for n in self.seg_lengths:
            out.append((i, i + n))
            i += n
        return out

    def _seg_groups(self):
        """Segment indices grouped by pytree structure.  Heterogeneous gait
        problems interleave many same-structure segments (e.g. 5 RigidBody
        runs + 4 Impulse switches); evaluating each group with ONE vmap over
        the gathered knots cuts tracing/compile time from O(n_segments) to
        O(n_unique_structures) node-graph traces."""
        groups, order = {}, []
        for si, seg in enumerate(self.segments):
            key = jax.tree.structure(seg)
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(si)
        return [groups[k] for k in order]

    def _grouped_apply(self, fn, xs, us, block_fn=None):
        """Apply ``fn(model, x, u)`` vmapped over every knot, tracing the node
        graph once per unique segment structure; returns the per-segment
        output list in time order.

        ``block_fn(stacked_model, xs, us)``, when given, replaces the plain
        ``vmap(fn)`` evaluation of a whole stacked block (used to route
        calc_both through the fused Pallas node kernel)."""
        segs = self.segments
        slices = self._seg_slices()
        outs = [None] * len(segs)
        apply = (block_fn if block_fn is not None
                 else (lambda m, x, u: jax.vmap(fn)(m, x, u)))
        for idxs in self._seg_groups():
            if len(idxs) == 1:
                si = idxs[0]
                i, j = slices[si]
                outs[si] = apply(segs[si], xs[i:j], us[i:j])
                continue
            cat = jax.tree.map(
                lambda *ls: jnp.concatenate(ls, axis=0),
                *[segs[si] for si in idxs])
            xs_cat = jnp.concatenate([xs[slices[si][0]:slices[si][1]]
                                      for si in idxs], axis=0)
            us_cat = jnp.concatenate([us[slices[si][0]:slices[si][1]]
                                      for si in idxs], axis=0)
            out_cat = apply(cat, xs_cat, us_cat)
            off = 0
            for si in idxs:
                n = self.seg_lengths[si]
                outs[si] = jax.tree.map(lambda l: l[off:off + n], out_cat)
                off += n
        return outs

    # ------------------------------------------------------------------
    def calc(self, xs: jax.Array, us: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Evaluate every node at the given trajectory.

        Returns (xnexts (T, nx), costs (T+1,)) — costs[T] is the terminal
        cost.  Mirrors ShootingProblem::calc (shooting.hxx:133-161).
        """
        outs = self._grouped_apply(lambda m, x, u: m.calc(x, u), xs, us)
        cterm = self.terminal.calc_terminal(xs[-1])
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs] + [cterm[None]]))

    def calc_diff(self, xs: jax.Array, us: jax.Array) -> Tuple[NodeDerivs, NodeDerivs]:
        """Derivatives of every node, stacked over T, plus terminal derivs.

        Mirrors ShootingProblem::calcDiff (shooting.hxx:163-196).
        """
        derivs = _concat_tree(
            self._grouped_apply(lambda m, x, u: m.calc_diff(x, u), xs, us))
        dterm = self.terminal.calc_diff_terminal(xs[-1])
        return derivs, dterm

    def calc_diff_full(self, xs: jax.Array, us: jax.Array):
        """One fused pass: (derivs, dterm, xnexts, costs) — what the solver's
        calcDiff step actually needs (derivatives + gaps + cost,
        ddp.cpp:157-178) without evaluating the dynamics twice.

        On the TPU backend (or with CT_FUSED set), supported node structures
        route through the fused Pallas node-linearization kernel
        (ops/fused_node.py) — one kernel per 128-node block instead of the
        ~4.5k-op vmapped graph; unsupported structures fall back to the
        generic vmapped node path per segment group."""
        from ..ops import fused_node

        def block(m, x, u):
            if fused_node.enabled_for(m):
                return fused_node.calc_both_stacked(m, x, u)
            return jax.vmap(lambda mm, xx, uu: mm.calc_both(xx, uu))(m, x, u)

        outs = self._grouped_apply(None, xs, us, block_fn=block)
        derivs = _concat_tree([o[0] for o in outs])
        xnexts = jnp.concatenate([o[1] for o in outs], axis=0)
        costs = jnp.concatenate([o[2] for o in outs], axis=0)
        # Terminal node through the fused kernel when its structure is
        # covered: a dt=0 node IS the terminal node (euler.hxx:64-74 —
        # Fx=I, Fu=0, undiscounted cost), so one extra 1-node kernel block
        # replaces the generic node trace (~hundreds of small ops that
        # dominate b=1 latency).  Lu/Lxu/Luu are zeroed to match
        # calc_diff_terminal's Ru=0 convention exactly (the solver never
        # reads them for the terminal, but keep the contract tight).
        term1 = None
        if getattr(self.terminal, "dt", None) is not None:
            term1 = jax.tree.map(lambda l: jnp.asarray(l)[None],
                                 self.terminal)
            term1 = term1.replace(dt=jnp.zeros_like(term1.dt))
        if term1 is not None and fused_node.enabled_for(term1):
            d1, _, c1 = fused_node.calc_both_stacked(
                term1, xs[-1:],
                jnp.zeros((1, self.nu), xs.dtype))
            dterm = jax.tree.map(lambda l: l[0], d1)
            dterm = dterm.replace(Lu=jnp.zeros_like(dterm.Lu),
                                  Lxu=jnp.zeros_like(dterm.Lxu),
                                  Luu=jnp.zeros_like(dterm.Luu))
            cterm = c1[0]
        else:
            dterm = self.terminal.calc_diff_terminal(xs[-1])
            cterm = self.terminal.calc_terminal(xs[-1])
        return derivs, dterm, xnexts, jnp.concatenate([costs, cterm[None]])

    def rollout(self, us: jax.Array) -> jax.Array:
        """Sequential open-loop rollout from x0 (shooting.hxx rollout)."""

        def step(x, mu):
            m, u = mu
            xn, _ = m.calc(x, u)
            return xn, x

        x = self.x0
        xs_parts = []
        for seg, (i, j) in zip(self.segments, self._seg_slices()):
            x, xs = jax.lax.scan(step, x, (seg, us[i:j]))
            xs_parts.append(xs)
        return jnp.concatenate(xs_parts + [x[None]], axis=0)

    def quasi_static(self, xs: jax.Array) -> jax.Array:
        outs = self._grouped_apply(
            lambda m, x, u: m.quasi_static(x), xs[:-1],
            jnp.zeros((self.T, 1), xs.dtype))
        return jnp.concatenate(outs, axis=0)
