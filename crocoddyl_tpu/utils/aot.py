"""Ahead-of-time compilation + export of solver programs.

Reference: core/codegen/action-base.hpp (ActionModelCodeGen) records a
CppADCodeGen tape of calc/calcDiff, emits C, and dlopens it so the hot loop
runs fully compiled.  The TPU-native equivalent is XLA AOT: ``jax.jit(...)
.lower(...).compile()`` produces the final executable once, and
``jax.export`` serializes it (StableHLO) for reuse across processes — the
role the generated ``.so`` plays in the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax


def precompile(fn: Callable, *example_args, **jit_kwargs):
    """Return the compiled executable for ``fn`` at the example arguments'
    shapes/dtypes (compile happens now, not at first call)."""
    return jax.jit(fn, **jit_kwargs).lower(*example_args).compile()


def export_bytes(fn: Callable, *example_args, **jit_kwargs) -> bytes:
    """Serialize ``fn`` (StableHLO) for cross-process reuse."""
    from jax import export as jexport
    exp = jexport.export(jax.jit(fn, **jit_kwargs))(*example_args)
    return exp.serialize()


def import_bytes(data: bytes) -> Callable:
    """Deserialize a program exported with :func:`export_bytes`; returns a
    callable running the compiled program."""
    from jax import export as jexport
    exp = jexport.deserialize(data)
    return exp.call
