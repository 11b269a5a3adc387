"""Neighborhood utilities — public API parity with the reference's
``forest_fire/utils/neighbors.py`` (``moore_n``: 6-147, ``neighborhood_at``:
152-184).

The reference implements ``moore_n`` as a 4-corner case analysis; here it is
pad-then-slice (works for jnp and numpy arrays, jit-safe for static
positions via ``lax.dynamic_slice`` when traced).  These helpers are for
user code / rendering / tests — the CA hot paths use whole-grid shifted
views (``gymca_tpu.ops.stencil``), not per-cell windows.
"""

from __future__ import annotations

from collections import namedtuple

import jax.numpy as jnp
from jax import lax

__all__ = ["moore_n", "neighborhood_at", "Neighbors"]

Neighbors = namedtuple(
    "Neighbors",
    [
        "up_left", "up", "up_right",
        "left", "self_", "right",
        "down_left", "down", "down_right",
    ],
)


def moore_n(n: int, pos, grid, invariant=0):
    """Radius-``n`` Moore neighborhood of ``pos``, out-of-bounds filled with
    ``invariant``.  Returns a (2n+1, 2n+1) array; jit-safe (dynamic ``pos``).
    """
    grid = jnp.asarray(grid)
    padded = jnp.pad(grid, ((n, n), (n, n)), constant_values=invariant)
    row = jnp.asarray(pos[0], jnp.int32)
    col = jnp.asarray(pos[1], jnp.int32)
    return lax.dynamic_slice(padded, (row, col), (2 * n + 1, 2 * n + 1))


def neighborhood_at(grid, pos, invariant=0) -> Neighbors:
    """The 9-cell namedtuple around ``pos`` (reference neighbors.py:152-184)."""
    w = moore_n(1, pos, grid, invariant)
    return Neighbors(
        up_left=w[0, 0], up=w[0, 1], up_right=w[0, 2],
        left=w[1, 0], self_=w[1, 1], right=w[1, 2],
        down_left=w[2, 0], down=w[2, 1], down_right=w[2, 2],
    )
