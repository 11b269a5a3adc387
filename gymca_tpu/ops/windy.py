"""WindyForestFire — vectorized 3-state windy CA rule.

Behavioral re-design of reference ``operators/ca_windy.py:11-173``:

The reference encodes the 4-rule table (Dead / Keep / Propagate / Consume) in
a *weighted convolution + threshold decode*: kernel center weight 2^11,
neighbor weight 2^3, cell values ``empty < tree < fire`` chosen so the score
intervals separate the rules (proved in ``ca_windy.py:141-173``).  Wind is a
3x3 matrix of propagation probabilities; one 3x3 uniform roll per update
globally disables failed directions (``ca_windy.py:53-67``).

TPU-native form: the signal is computed as 8 *shifted whole-grid adds* (one
padded copy, 8 static slices — pure VPU work that XLA fuses into the decode),
instead of scipy's C ``convolve2d`` (``ca_windy.py:79-82``).  A fused Pallas
kernel for the same update lives in ``gymca_tpu.ops.pallas_kernels`` and is
used when enabled; this XLA version is the differential-testing reference.

Direction convention matches scipy ``convolve2d`` (kernel flip): the neighbor
at offset ``(dr, dc)`` is gated by ``wind[1 - dr, 1 - dc]``.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp

from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import BoxSpec
from gymca_tpu.ops.stencil import moore_shifts

__all__ = [
    "WindyForestFire",
    "windy_step",
    "windy_step_from_success",
    "windy_breaks",
    "assert_windy_encoding",
]

# Convolution weights, magic variables (reference ca_windy.py:19-20).
IDENTITY = 2**11
PROPAGATION = 2**3

Breaks = namedtuple("Breaks", ["keep", "propagate", "consume"])


def windy_breaks(empty: int, tree: int, fire: int) -> Breaks:
    """3 score breaks for the 4 rules (reference ca_windy.py:84-100)."""
    keep_break = IDENTITY * tree
    propagate_break = IDENTITY * tree + PROPAGATION * fire
    consume_break = IDENTITY * fire
    return Breaks(keep_break, propagate_break, consume_break)


def assert_windy_encoding(empty: int, tree: int, fire: int) -> None:
    """Static proof that the score intervals separate the 4 rules
    (reference ca_windy.py:141-173)."""
    n, i, p = 8, IDENTITY, PROPAGATION
    E, T, F = empty, tree, fire
    assert E < T < F, "Cell value ordering"
    assert p < i, "Weight ordering"
    worst = n * p * F  # surrounded by fire
    assert i * E + worst < i * T, "Dead / Keep"
    assert i * T + n * p * T < i * T + p * F, "Keep / Propagate"
    assert i * T + worst < i * F, "Propagate / Consume"


def windy_step_from_success(grid, success, *, empty: int, tree: int, fire: int):
    """Deterministic windy-CA update given the 3x3 gust-success mask.

    Split out of :func:`windy_step` so spatially-sharded execution
    (``gymca_tpu.parallel.spatial``) can apply the *same* global gust to
    every grid shard.
    """
    signal = IDENTITY * grid.astype(jnp.int32)
    for (dr, dc), view in moore_shifts(grid.astype(jnp.int32), empty):
        w = jnp.where(success[1 - dr, 1 - dc], PROPAGATION, 0)
        signal = signal + w * view

    b = windy_breaks(empty, tree, fire)
    return jnp.where(
        signal >= b.consume,
        empty,  # Consume: FIRE -> EMPTY
        jnp.where(
            signal >= b.propagate,
            fire,  # Propagate: TREE -> FIRE
            jnp.where(signal >= b.keep, tree, empty),  # Keep / Dead
        ),
    ).astype(grid.dtype)


def windy_step(grid, wind, key, *, empty: int, tree: int, fire: int):
    """One windy-CA update.  Pure; (..., H, W) int grid in, same out.

    ``wind[i, j]`` = probability the kernel position (i, j) propagates this
    step; a single 3x3 roll gates all cells (global wind gusts), exactly as
    the reference (ca_windy.py:53-67).
    """
    roll = jax.random.uniform(key, (3, 3), dtype=jnp.float32)
    success = wind > roll  # failed propagation: wind <= roll
    return windy_step_from_success(
        grid, success, empty=empty, tree=tree, fire=fire
    )


class WindyForestFire(Operator):
    """Operator wrapper over :func:`windy_step`."""

    grid_dependant = True
    action_dependant = False
    context_dependant = True
    deterministic = False

    def __init__(self, empty=0, tree=3, fire=25, **kwargs):
        super().__init__(**kwargs)
        self.empty, self.tree, self.fire = empty, tree, fire
        assert_windy_encoding(empty, tree, fire)
        self.breaks = windy_breaks(empty, tree, fire)
        if self.context_spec is None:
            self.context_spec = BoxSpec(0.0, 1.0, shape=(3, 3))

    def update(self, grid, action, wind, key=None):
        new_grid = windy_step(
            grid, wind, key, empty=self.empty, tree=self.tree, fire=self.fire
        )
        return new_grid, wind
