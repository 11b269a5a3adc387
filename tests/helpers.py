"""Shared test helpers: operator contract checker + neighborhood oracle.

Counterpart of reference ``gym_cellular_automata/tests/__init__.py`` /
``tests/test_operator.py:9-67`` (``assert_operator``) and the independent
neighborhood oracle used by the CA rule-table tests.
"""

from __future__ import annotations

import numpy as np

from gymca_tpu.core.operator import Operator


def assert_operator(op: Operator, strict: bool = False):
    """Check the Operator contract, recursively over suboperators."""
    assert isinstance(op, Operator)
    assert isinstance(op.suboperators, tuple)

    for attr in ("grid_dependant", "action_dependant", "context_dependant",
                 "deterministic"):
        val = getattr(op, attr)
        if strict:
            assert isinstance(val, bool), f"{op}.{attr} must be set"
        else:
            assert val is None or isinstance(val, bool)

    for sub in op.suboperators:
        assert_operator(sub, strict)


def neighborhood_at(grid: np.ndarray, pos, invariant=0):
    """Independent Moore-neighborhood oracle (EAFP, unlike the library's
    shifted-views implementation)."""
    grid = np.asarray(grid)
    r, c = pos
    out = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            rr, cc = r + dr, c + dc
            if 0 <= rr < grid.shape[0] and 0 <= cc < grid.shape[1]:
                out.append(int(grid[rr, cc]))
            else:
                out.append(invariant)
    return out  # row-major 9 values; index 4 is the cell itself
