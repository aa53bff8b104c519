"""Precision policy helpers.

The reference is double-only (MathBaseTpl<double>); on TPU the throughput
path is float32 (MXU), so problems are built in float64 (numerically exact
references/weights) and cast to float32 for device execution.  Mixed-precision
notes: the FDDP backward pass accumulates in the working dtype; for tight
control-deviation targets run float64 on CPU or keep f32 with more iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every floating-point array leaf of a pytree to ``dtype``
    (integer/bool leaves and static metadata untouched)."""

    def _cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(_cast, tree)
