"""Move/Modify oracle tests (reference operators/tests/test_move_modify.py)."""

import jax.numpy as jnp
import numpy as np

from gymca_tpu.ops.move_modify import (
    DEFAULT_DIRECTIONS,
    Modify,
    ModifyDousing,
    Move,
    MoveModify,
)


def oracle_new_position(position, action, nrows, ncols):
    """Independent reimplementation of the reference's Move semantics
    (move_modify.py:41-65)."""
    row, col = position
    if action in DEFAULT_DIRECTIONS["up"] and row > 0:
        row -= 1
    if action in DEFAULT_DIRECTIONS["down"] and row < nrows - 1:
        row += 1
    if action in DEFAULT_DIRECTIONS["left"] and col > 0:
        col -= 1
    if action in DEFAULT_DIRECTIONS["right"] and col < ncols - 1:
        col += 1
    return row, col


class TestMove:
    def test_against_oracle(self):
        move = Move(DEFAULT_DIRECTIONS)
        grid = jnp.zeros((5, 7), jnp.int32)
        positions = [(0, 0), (0, 6), (4, 0), (4, 6), (2, 3), (0, 3), (4, 3),
                     (2, 0), (2, 6)]
        for pos in positions:
            for action in range(9):
                _, new_pos = move(grid, jnp.asarray(action), jnp.asarray(pos))
                expected = oracle_new_position(pos, action, 5, 7)
                assert tuple(np.asarray(new_pos)) == expected, (pos, action)

    def test_not_move(self):
        move = Move(DEFAULT_DIRECTIONS)
        grid = jnp.zeros((3, 3), jnp.int32)
        _, p = move(grid, jnp.asarray(4), jnp.asarray([1, 1]))
        assert tuple(np.asarray(p)) == (1, 1)


class TestModify:
    def test_effects_substitution(self):
        modify = Modify({3: 0})
        grid = jnp.full((3, 3), 3, jnp.int32)
        pos = jnp.asarray([1, 1])
        new_grid, (p, hit) = modify(grid, jnp.asarray(1), pos)
        assert int(new_grid[1, 1]) == 0
        assert bool(hit)
        # action = 0 -> no substitution, no hit
        new_grid, (p, hit) = modify(grid, jnp.asarray(0), pos)
        assert int(new_grid[1, 1]) == 3
        assert not bool(hit)

    def test_no_effect_on_unmapped_cell(self):
        modify = Modify({25: 0})
        grid = jnp.full((3, 3), 3, jnp.int32)
        new_grid, (_, hit) = modify(grid, jnp.asarray(1), jnp.asarray([0, 0]))
        assert int(new_grid[0, 0]) == 3
        assert not bool(hit)

    def test_empty_effects(self):
        modify = Modify({})
        grid = jnp.full((3, 3), 3, jnp.int32)
        new_grid, (_, hit) = modify(grid, jnp.asarray(1), jnp.asarray([0, 0]))
        assert jnp.array_equal(new_grid, grid)
        assert not bool(hit)


class TestModifyDousing:
    def test_dousing_write(self):
        op = ModifyDousing()
        grid = jnp.zeros((4, 4), jnp.int32)
        dousing = jnp.zeros((4, 4), jnp.int32)
        pos = jnp.asarray([2, 3])
        _, (p, new_dousing) = op(grid, jnp.asarray(1), (pos, dousing))
        assert int(new_dousing[2, 3]) == 1
        assert int(new_dousing.sum()) == 1
        _, (p, untouched) = op(grid, jnp.asarray(0), (pos, dousing))
        assert int(untouched.sum()) == 0


class TestMoveModify:
    def test_composite(self):
        mm = MoveModify(Move(DEFAULT_DIRECTIONS), Modify({3: 0}))
        grid = jnp.full((4, 4), 3, jnp.int32)
        pos = jnp.asarray([1, 1])
        # move right (5), shoot (1): lands at (1,2) and bulldozes it
        new_grid, (new_pos, hit) = mm(grid, (jnp.asarray(5), jnp.asarray(1)), pos)
        assert tuple(np.asarray(new_pos)) == (1, 2)
        assert int(new_grid[1, 2]) == 0
        assert bool(hit)
