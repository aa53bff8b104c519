"""MPC horizon rotation + warm starting.

Reference: ShootingProblem::circularAppend (core/optctrl/shooting.hpp:112-129)
rotates the node list for receding-horizon replanning, and warm-started
``solve(init_xs, init_us, ...)`` (solver-base.hpp:126-137 setCandidate) is the
checkpoint/resume mechanism (SURVEY §5).

TPU-native: the running horizon is one stacked pytree with a leading T axis,
so rotation is a ``jnp.roll`` on every leaf — O(1) jitted data movement, no
Python list surgery — and the whole replan step (rotate, shift, solve) stays
inside one jitted program.

Segmented (heterogeneous node-type) problems: a fixed-shape jitted program
cannot move a node across a segment-type boundary (the slot's pytree
structure is static), so ``circular_append`` rejects multi-segment problems;
``rotate_segmented`` performs the same whole-horizon rotation by list
rebuild at the Python level (new static segmentation ⇒ recompile), which is
the honest analogue of the reference's pointer surgery.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .action import ActionModel
from .problem import ShootingProblem


def _unstack(model):
    """Split a stacked model (leading T axis on every leaf) into a list of
    per-node pytrees."""
    T = jax.tree.leaves(model)[0].shape[0]
    return [jax.tree.map(lambda l: l[t], model) for t in range(T)]


def stack_nodes(nodes):
    """Stack a list of structurally identical per-node pytrees along a new
    leading axis."""
    return jax.tree.map(lambda *ls: jnp.stack(ls, axis=0), *nodes)


def circular_append(problem: ShootingProblem,
                    new_model: Optional[ActionModel] = None,
                    new_x0: Optional[jax.Array] = None) -> ShootingProblem:
    """Rotate the horizon one knot: node 0 is dropped, nodes shift left, and
    the freed tail slot takes ``new_model``'s parameters (default: recycle the
    dropped node, i.e. a cyclic gait schedule).  Mirrors
    ShootingProblem::circularAppend (shooting.hpp:112-129).

    Jit-safe (pure ``jnp.roll`` data movement).  Requires a single-segment
    (homogeneous node-type) problem — use :func:`rotate_segmented` for
    problems with impulse segments.
    """
    if isinstance(problem.running, tuple) and len(problem.running) > 1:
        raise ValueError(
            "circular_append cannot rotate across segment-type boundaries "
            "inside jit (static shapes); use rotate_segmented() for "
            "heterogeneous problems")
    running = (problem.running[0] if isinstance(problem.running, tuple)
               else problem.running)

    def rot(leaf, new_leaf=None):
        rolled = jnp.roll(leaf, -1, axis=0)
        if new_leaf is not None:
            rolled = rolled.at[-1].set(new_leaf)
        return rolled

    if new_model is None:
        running = jax.tree.map(rot, running)
    else:
        running = jax.tree.map(lambda l, n: rot(l, n), running, new_model)
    if isinstance(problem.running, tuple):
        running = (running,)
    x0 = problem.x0 if new_x0 is None else jnp.asarray(new_x0)
    return problem.replace(running=running, x0=x0)


def rotate_segmented(problem: ShootingProblem, k: int = 1,
                     new_models=None,
                     new_x0: Optional[jax.Array] = None) -> ShootingProblem:
    """Whole-horizon rotation by ``k`` knots for SEGMENTED problems: the
    first k nodes are dropped and k models are appended at the tail
    (``new_models``, default: the dropped nodes — the cyclic schedule).

    Python-level list rebuild (the direct analogue of the reference's
    node-pointer rotation, shooting.hpp:119-129): the node list is
    re-grouped into consecutive same-structure segments, so the static
    segmentation changes and downstream jits recompile.  Use
    :func:`circular_append` for homogeneous problems where rotation is a
    jitted roll."""
    from itertools import groupby

    nodes = []
    for seg in problem.segments:
        nodes.extend(_unstack(seg))
    k = k % len(nodes)
    dropped, rest = nodes[:k], nodes[k:]
    if new_models is None:
        new_models = dropped
    nodes = rest + list(new_models)

    def _key(n):
        return (type(n), jax.tree.structure(n))

    segments = tuple(stack_nodes(list(grp))
                     for _, grp in groupby(nodes, key=_key))
    running = segments[0] if len(segments) == 1 else segments
    x0 = problem.x0 if new_x0 is None else jnp.asarray(new_x0)
    return problem.replace(running=running, x0=x0)


def shift_warm_start(xs: jax.Array, us: jax.Array,
                     x_measured: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Shift a previous solution one knot for the next replan: xs/us roll
    left, tail repeats the last knot, and (optionally) the head is pinned to
    the measured state — the standard warm start used with circularAppend."""
    xs_n = jnp.roll(xs, -1, axis=0).at[-1].set(xs[-1])
    us_n = jnp.roll(us, -1, axis=0).at[-1].set(us[-1])
    if x_measured is not None:
        xs_n = xs_n.at[0].set(x_measured)
    return xs_n, us_n
