"""Quadrotor goal-reaching with rotor-thrust bounds — BoxFDDP
(reference: examples/quadrotor_ubound.py, golden log
examples/log/quadrotor_ubound.log: BoxFDDP with per-rotor thrust limits)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd
if _os.environ.get("CROCODDYL_TPU_EXAMPLES_BACKEND", "cpu64") == "cpu64":
    # examples are analysis scripts: run f64 on CPU like the
    # reference (set CROCODDYL_TPU_EXAMPLES_BACKEND=native to keep
    # the default device/precision, e.g. TPU f32)
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_enable_x64", True)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quadrotor import main as _main  # noqa: E402


def main():
    return _main(ubound=True)


if __name__ == "__main__":
    main()
