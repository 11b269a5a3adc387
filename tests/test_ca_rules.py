"""CA rule-table property tests.

Pattern from the reference (SURVEY §4): sample a random grid, apply the
operator, then check the rule table at sampled cells against an
*independently computed* neighborhood oracle
(reference operators/tests/test_ca_windy.py:55-102,
test_ca_DrosselSchwabl.py:62-106).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.drossel import ForestFire, drossel_step
from gymca_tpu.ops.windy import WindyForestFire, assert_windy_encoding, windy_step
from tests.helpers import neighborhood_at

EMPTY, TREE, FIRE = 0, 3, 25


def random_grid(key, shape=(16, 16), values=(EMPTY, TREE, FIRE)):
    idx = jax.random.randint(key, shape, 0, len(values))
    return jnp.asarray(np.asarray(values)[np.asarray(idx)], jnp.int32)


class TestWindy:
    def test_encoding_proof(self):
        assert_windy_encoding(EMPTY, TREE, FIRE)
        with pytest.raises(AssertionError):
            assert_windy_encoding(0, 25, 3)

    def test_rule_table_max_wind(self, key):
        """Under wind=1 everywhere, propagation is deterministic."""
        wind = jnp.ones((3, 3))
        for trial in range(4):
            k1, k2 = jax.random.split(jax.random.fold_in(key, trial))
            grid = random_grid(k1)
            new = np.asarray(windy_step(grid, wind, k2, empty=EMPTY, tree=TREE,
                                        fire=FIRE))
            old = np.asarray(grid)
            for r in range(16):
                for c in range(16):
                    neigh = neighborhood_at(old, (r, c), invariant=EMPTY)
                    cell = old[r, c]
                    fire_nearby = FIRE in (neigh[:4] + neigh[5:])
                    if cell == TREE and fire_nearby:
                        assert new[r, c] == FIRE, (r, c)
                    elif cell == TREE:
                        assert new[r, c] == TREE, (r, c)
                    elif cell == FIRE:
                        assert new[r, c] == EMPTY, (r, c)
                    else:
                        assert new[r, c] == EMPTY, (r, c)

    def test_zero_wind_no_propagation(self, key):
        wind = jnp.zeros((3, 3))
        grid = jnp.full((8, 8), TREE, jnp.int32).at[4, 4].set(FIRE)
        new = windy_step(grid, wind, key, empty=EMPTY, tree=TREE, fire=FIRE)
        assert int(jnp.sum(new == FIRE)) == 0  # fire burned out, none spread
        assert int(jnp.sum(new == TREE)) == 63

    def test_operator_wrapper(self, key):
        op = WindyForestFire(EMPTY, TREE, FIRE)
        grid = random_grid(key)
        wind = jnp.ones((3, 3))
        new_grid, new_wind = op(grid, None, wind, key)
        assert new_grid.shape == grid.shape
        assert jnp.array_equal(new_wind, wind)

    def test_batched_matches_single(self, key):
        """vmapped batch == stacked single-env updates (same keys)."""
        wind = jnp.ones((3, 3))
        keys = jax.random.split(key, 4)
        grids = jnp.stack([random_grid(k) for k in keys])
        step = lambda g, k: windy_step(g, wind, k, empty=EMPTY, tree=TREE, fire=FIRE)
        batched = jax.vmap(step)(grids, keys)
        singles = jnp.stack([step(grids[i], keys[i]) for i in range(4)])
        assert jnp.array_equal(batched, singles)


class TestDrossel:
    def test_deterministic_rules(self, key):
        """p_fire = p_tree = 0: only neighbor-propagation and burn-out act."""
        for trial in range(4):
            k1, k2 = jax.random.split(jax.random.fold_in(key, trial))
            grid = random_grid(k1, values=(0, 1, 2))
            new = np.asarray(drossel_step(grid, 0.0, 0.0, k2, empty=0, tree=1,
                                          fire=2))
            old = np.asarray(grid)
            for r in range(16):
                for c in range(16):
                    neigh = neighborhood_at(old, (r, c), invariant=0)
                    cell = old[r, c]
                    fire_nearby = 2 in (neigh[:4] + neigh[5:])
                    if cell == 1 and fire_nearby:
                        assert new[r, c] == 2
                    elif cell == 1:
                        assert new[r, c] == 1
                    elif cell == 2:
                        assert new[r, c] == 0
                    else:
                        assert new[r, c] == 0

    def test_certain_lightning_and_growth(self, key):
        grid = jnp.asarray([[1, 0], [0, 1]], jnp.int32)
        new = drossel_step(grid, 1.0, 1.0, key, empty=0, tree=1, fire=2)
        assert bool(jnp.all(new == jnp.asarray([[2, 1], [1, 2]])))

    def test_operator_wrapper(self, key):
        op = ForestFire(0, 1, 2)
        grid = random_grid(key, values=(0, 1, 2))
        ctx = jnp.asarray([0.5, 0.5])
        new_grid, new_ctx = op(grid, None, ctx, key)
        assert new_grid.shape == grid.shape
        assert jnp.array_equal(new_ctx, ctx)
