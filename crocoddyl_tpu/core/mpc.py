"""MPC horizon rotation + warm starting.

Reference: ShootingProblem::circularAppend (core/optctrl/shooting.hpp:112-129)
rotates the node list for receding-horizon replanning, and warm-started
``solve(init_xs, init_us, ...)`` (solver-base.hpp:126-137 setCandidate) is the
checkpoint/resume mechanism (SURVEY §5).

TPU-native: the running horizon is one stacked pytree with a leading T axis,
so rotation is a ``jnp.roll`` on every leaf — O(1) jitted data movement, no
Python list surgery — and the whole replan step (rotate, shift, solve) stays
inside one jitted program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .action import ActionModel
from .problem import ShootingProblem


def circular_append(problem: ShootingProblem,
                    new_model: Optional[ActionModel] = None,
                    new_x0: Optional[jax.Array] = None) -> ShootingProblem:
    """Rotate the horizon one knot: node 0 is dropped, nodes shift left, and
    the freed tail slot takes ``new_model``'s parameters (default: recycle the
    dropped node, i.e. a cyclic gait schedule).  Mirrors
    ShootingProblem::circularAppend (shooting.hpp:112-129)."""

    def rot(leaf, new_leaf=None):
        rolled = jnp.roll(leaf, -1, axis=0)
        if new_leaf is not None:
            rolled = rolled.at[-1].set(new_leaf)
        return rolled

    if new_model is None:
        running = jax.tree.map(rot, problem.running)
    else:
        running = jax.tree.map(lambda l, n: rot(l, n), problem.running,
                               new_model)
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
