"""Agent operators: Move, Modify, MoveModify (+ dousing variant).

Behavioral counterparts of reference ``operators/move_modify.py:9-134`` and
``operators/move_modify_jax.py:11-157``, as pure branchless JAX:

* ``Move``   — action in 0..8 (Moore directions, row-major with 4=not_move)
  displaces the agent, clamped at borders.
* ``Modify`` — when the modify sub-action is truthy, substitutes the grid cell
  at the agent position through an ``effects`` mapping; reports a ``hit`` flag
  (the reference stores it statefully on the operator, ``move_modify.py:84-94``
  — here it is returned in the context).
* ``ModifyDousing`` — the Advanced-env shooting semantics: writes
  ``dousing_count[pos] = 1``; the grid itself is untouched
  (``move_modify_jax.py:102-114``).
"""

from __future__ import annotations

from typing import Dict, Set

import jax.numpy as jnp

from gymca_tpu.config import TYPE_INT
from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import DiscreteSpec, MultiDiscreteSpec

__all__ = ["Move", "Modify", "ModifyDousing", "MoveModify", "DEFAULT_DIRECTIONS",
           "move_position"]

# Action ids 0..8 in the reference layout (bulldozer.py:71-83):
#   0 up_left, 1 up, 2 up_right, 3 left, 4 not_move, 5 right,
#   6 down_left, 7 down, 8 down_right
DEFAULT_DIRECTIONS: Dict[str, Set[int]] = {
    "up": {0, 1, 2},
    "down": {6, 7, 8},
    "left": {0, 3, 6},
    "right": {2, 5, 8},
    "not_move": {4},
}


def _set_to_delta(directions: Dict[str, Set[int]], n_actions: int = 9):
    """Precompute per-action (drow, dcol) lookup tables."""
    drow = [0] * n_actions
    dcol = [0] * n_actions
    for a in range(n_actions):
        if a in directions["up"]:
            drow[a] -= 1
        if a in directions["down"]:
            drow[a] += 1
        if a in directions["left"]:
            dcol[a] -= 1
        if a in directions["right"]:
            dcol[a] += 1
    return jnp.asarray(drow, TYPE_INT), jnp.asarray(dcol, TYPE_INT)


def move_position(position, action, nrows: int, ncols: int, drow, dcol):
    """Branchless clamped displacement (reference move_modify.py:41-65).

    The reference clamps per-axis *before* moving (a move into the wall keeps
    the coordinate), which equals clipping the target to the grid box.
    """
    a = action.astype(TYPE_INT)
    row = jnp.clip(position[..., 0] + drow[a], 0, nrows - 1)
    col = jnp.clip(position[..., 1] + dcol[a], 0, ncols - 1)
    return jnp.stack([row, col], axis=-1)


class Move(Operator):
    grid_dependant = False
    action_dependant = True
    context_dependant = True
    deterministic = True

    def __init__(self, directions_sets: Dict[str, Set[int]] = None, **kwargs):
        super().__init__(**kwargs)
        directions_sets = directions_sets or DEFAULT_DIRECTIONS
        self.directions_sets = directions_sets
        self.drow, self.dcol = _set_to_delta(directions_sets)
        if self.action_spec is None:
            self.action_spec = DiscreteSpec(9)

    def update(self, grid, action, position, key=None):
        nrows, ncols = grid.shape[-2], grid.shape[-1]
        return grid, move_position(position, action, nrows, ncols, self.drow, self.dcol)


class Modify(Operator):
    grid_dependant = True
    action_dependant = True
    context_dependant = True
    deterministic = True

    def __init__(self, effects: Dict[int, int], **kwargs):
        super().__init__(**kwargs)
        self.effects = dict(effects)
        keys = list(effects.keys()) or [0]
        vals = [effects.get(k, 0) for k in keys]
        self.effect_keys = jnp.asarray(keys, TYPE_INT)
        self.effect_values = jnp.asarray(vals, TYPE_INT)
        self.has_effects = len(effects) > 0
        if self.action_spec is None:
            self.action_spec = DiscreteSpec(2)

    def update(self, grid, action, position, key=None):
        """Returns ``(grid, (position, hit))``."""
        row, col = position[..., 0], position[..., 1]
        cell = grid[..., row, col]
        do = action.astype(bool)
        if not self.has_effects:
            return grid, (position, jnp.zeros((), bool))
        match = cell == self.effect_keys
        mapped = jnp.where(
            match.any(), self.effect_values[jnp.argmax(match)], cell
        ).astype(grid.dtype)
        hit = do & match.any()
        new_grid = grid.at[..., row, col].set(jnp.where(do, mapped, cell))
        return new_grid, (position, hit)


class ModifyDousing(Operator):
    """Advanced-env shooting: mark ``dousing_count[pos] = 1`` when acting.

    Context = ``(position, dousing_count)``.  The dousing field then
    suppresses burn probability inside the Alexandridis CA
    (reference ``ca_alexandridis_jax.py:198``).
    """

    grid_dependant = False
    action_dependant = True
    context_dependant = True
    deterministic = True

    def update(self, grid, action, context, key=None):
        position, dousing_count = context
        row, col = position[..., 0], position[..., 1]
        doused = dousing_count.at[..., row, col].set(1)
        new_dousing = jnp.where(action == 1, doused, dousing_count)
        return grid, (position, new_dousing)


class MoveModify(Operator):
    """Composite move-then-modify (reference move_modify.py:97-134).

    ``update(grid, (move_action, modify_action), position)`` ->
    ``(grid, (position, hit))``.
    """

    grid_dependant = True
    action_dependant = True
    context_dependant = True
    deterministic = True

    def __init__(self, move: Move, modify: Modify, **kwargs):
        super().__init__(**kwargs)
        self.move = move
        self.modify = modify
        self.suboperators = (move, modify)
        if self.action_spec is None and move.action_spec is not None:
            self.action_spec = MultiDiscreteSpec((9, 2))

    def update(self, grid, subactions, position, key=None):
        move_action, modify_action = subactions[0], subactions[1]
        grid, position = self.move(grid, move_action, position)
        grid, (position, hit) = self.modify(grid, modify_action, position)
        return grid, (position, hit)
