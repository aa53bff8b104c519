"""Quadrotor goal-reaching with rotor-thrust bounds — BoxFDDP
(reference: examples/quadrotor_ubound.py, golden log
examples/log/quadrotor_ubound.log: BoxFDDP with per-rotor thrust limits)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # allow running from any cwd

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quadrotor import main as _main  # noqa: E402


def main():
    return _main(ubound=True)


if __name__ == "__main__":
    main()
