"""Alexandridis CA unit tests (the reference has none — SURVEY §4 gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.alexandridis import (
    AlexandridisCA,
    build_burn_kernel,
    build_dousing_weights,
)

EMPTY, TREE, FIRE = 0, 1, 2


def make_contexts(ca, h, w, key, dousing=None):
    from gymca_tpu.envs.terrain import get_winds

    winds, fts = get_winds(True)
    per_env = {
        "wind_index": jnp.asarray(0),
        "density": jnp.full((h, w), 3),
        "vegetation": jnp.full((h, w), 3),
        "altitude": jnp.zeros((h, w)),
        "slope": jnp.zeros((h, w, 3, 3)),
        "fire_age": jnp.full((h, w), 100.0),
        "dousing_count": jnp.zeros((h, w), jnp.int32) if dousing is None else dousing,
    }
    shared = {
        "winds": winds,
        "fts": fts,
        "p_fire": jnp.asarray(0.00033),
        "p_tree": jnp.asarray(0.0),
        "p_wind_change": jnp.asarray(0.0),
    }
    return per_env, shared


class TestBurnKernel:
    def test_shape_and_budget(self):
        for radius in (1, 2, 3, 6):
            k = build_burn_kernel(radius)
            assert k.shape == (2 * radius + 1, 2 * radius + 1)
            # total weight budget 0.065 spread over rings + center
            assert abs(float(k.sum()) - 0.065) < 1e-5
            # ring decay: inner rings weigh more per cell than outer
            c = radius
            if radius >= 2:
                assert float(k[c, c - 1]) > float(k[c, c - 2])

    def test_dousing_weights(self):
        k = build_dousing_weights(fire_age_max=84)
        assert k.shape == (5, 5)
        assert float(k[2, 2]) > float(k[0, 0])  # inner > border


class TestAlexandridisUpdate:
    def test_burnout_at_age_one(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), EMPTY, jnp.int32).at[8, 8].set(FIRE)
        per_env, shared = make_contexts(ca, 16, 16, key)
        per_env["fire_age"] = jnp.zeros((16, 16)).at[8, 8].set(1.0)
        new_grid, (new_pe, _) = ca(grid, None, (per_env, shared), key)
        assert int(new_grid[8, 8]) == EMPTY  # age<=1 -> burn out
        assert int(jnp.sum(new_grid == FIRE)) == 0  # no trees to ignite

    def test_no_spontaneous_fire(self, key):
        """p_tree=0, no fire anywhere -> grid is a fixed point."""
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), TREE, jnp.int32)
        per_env, shared = make_contexts(ca, 16, 16, key)
        new_grid, _ = ca(grid, None, (per_env, shared), key)
        assert jnp.array_equal(new_grid, grid)

    def test_fire_spreads_eventually(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), TREE, jnp.int32).at[8, 8].set(FIRE)
        per_env, shared = make_contexts(ca, 16, 16, key)
        per_env["fire_age"] = jnp.zeros((16, 16)).at[8, 8].set(100.0)

        def step(carry, k):
            grid, pe = carry
            new_grid, (new_pe, _) = ca(grid, None, (pe, shared), k)
            return (new_grid, new_pe), jnp.sum(new_grid == FIRE)

        keys = jax.random.split(key, 60)
        (final, _), counts = jax.lax.scan(step, (grid, per_env), keys)
        assert int(counts[-1]) > 1, "fire should spread within 60 steps"

    def test_dousing_suppresses_spread(self, key):
        """Fully doused neighborhood -> burn probability <= 0 -> no spread."""
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), TREE, jnp.int32).at[8, 8].set(FIRE)
        doused = jnp.ones((16, 16), jnp.int32)
        per_env, shared = make_contexts(ca, 16, 16, key, dousing=doused)
        per_env["fire_age"] = jnp.zeros((16, 16)).at[8, 8].set(100.0)

        def step(carry, k):
            grid, pe = carry
            new_grid, (new_pe, _) = ca(grid, None, (pe, shared), k)
            return (new_grid, new_pe), jnp.sum(new_grid == FIRE)

        keys = jax.random.split(key, 30)
        (_, _), counts = jax.lax.scan(step, (grid, per_env), keys)
        assert int(counts.max()) <= 1, "dousing everywhere must prevent spread"

    def test_growth_with_p_tree_one(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), EMPTY, jnp.int32)
        per_env, shared = make_contexts(ca, 16, 16, key)
        shared = dict(shared)
        shared["p_tree"] = jnp.asarray(1.0)
        new_grid, _ = ca(grid, None, (per_env, shared), key)
        assert bool(jnp.all(new_grid == TREE))

    def test_wind_rotation_when_forced(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        grid = jnp.full((16, 16), EMPTY, jnp.int32)
        per_env, shared = make_contexts(ca, 16, 16, key)
        shared = dict(shared)
        shared["p_wind_change"] = jnp.asarray(1.0)
        _, (new_pe, _) = ca(grid, None, (per_env, shared), key)
        assert int(new_pe["wind_index"]) != 0  # rotated by randint(1,8) mod 8

    def test_new_fire_gets_age_in_range(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE)
        # certain ignition: tree surrounded by fire with huge heat; force by
        # large dousing-free heat via many fires
        grid = jnp.full((16, 16), FIRE, jnp.int32).at[8, 8].set(TREE)
        per_env, shared = make_contexts(ca, 16, 16, key)
        per_env["fire_age"] = jnp.full((16, 16), 50.0)

        ignited = False
        for i in range(20):
            k = jax.random.fold_in(key, i)
            new_grid, (new_pe, _) = ca(grid, None, (per_env, shared), k)
            if int(new_grid[8, 8]) == FIRE:
                age = float(new_pe["fire_age"][8, 8])
                assert ca.fire_age_min <= age <= ca.fire_age_max
                ignited = True
                break
        assert ignited, "surrounded tree should ignite within 20 tries"


class TestPinecones:
    def test_pinecone_mode_runs(self, key):
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE, enable_pinecones=True)
        grid = jnp.full((16, 16), TREE, jnp.int32).at[8, 8].set(FIRE)
        per_env, shared = make_contexts(ca, 16, 16, key)
        per_env["fire_age"] = jnp.zeros((16, 16)).at[8, 8].set(100.0)
        new_grid, _ = ca(grid, None, (per_env, shared), key)
        assert new_grid.shape == (16, 16)

    def test_zero_thrust_lands_on_source(self, key):
        """ft == 0 -> every ember lands on its own (fire) cell -> no burns."""
        ca = AlexandridisCA(16, EMPTY, TREE, FIRE, enable_pinecones=True)
        grid = jnp.full((16, 16), TREE, jnp.int32).at[8, 8].set(FIRE)
        per_env, _ = make_contexts(ca, 16, 16, key)
        rows, cols, lit = ca._pinecone_spread(
            grid, key, per_env, jnp.zeros((3, 3)), grid == FIRE
        )
        assert int(jnp.sum(lit)) == 0

    def test_direction_wind_pairing(self, key):
        """Only the ft cell paired with compass East (drow=+1, dcol=0) gets a
        nonzero thrust factor -> every lit ember stays in the fire cell's
        column (other directions fly distance 0 and land back on the fire).
        Pins the reference's direction <-> ft-matrix pairing
        (ca_alexandridis_jax.py:260-278)."""
        ca = AlexandridisCA(32, EMPTY, TREE, FIRE, enable_pinecones=True)
        grid = jnp.full((32, 32), TREE, jnp.int32).at[8, 8].set(FIRE)
        per_env, _ = make_contexts(ca, 32, 32, key)
        ft = jnp.zeros((3, 3)).at[0, 0].set(4.0)  # East's thrust cell

        lit_rows, lit_cols = [], []
        for i in range(30):
            rows, cols, lit = ca._pinecone_spread(
                grid, jax.random.fold_in(key, i), per_env, ft, grid == FIRE
            )
            m = np.asarray(lit)
            lit_rows.append(np.asarray(rows)[m])
            lit_cols.append(np.asarray(cols)[m])
        lit_rows = np.concatenate(lit_rows)
        lit_cols = np.concatenate(lit_cols)
        assert lit_rows.size > 0, "eastward flights should ignite some trees"
        assert np.all(lit_cols == 8), "East flights must preserve the column"
        assert np.all(lit_rows != 8), "lit embers landed on trees, not the fire"
