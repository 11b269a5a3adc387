"""End-to-end spatially-sharded env steps (virtual 8-device CPU mesh).

The full Bulldozer step on a row-sharded grid must be BIT-IDENTICAL to the
single-device ``BulldozerCore.step`` under the same key (the gust roll is
global/replicated; all randomness is in the replicated key chain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.envs.bulldozer import BulldozerCore
from gymca_tpu.parallel.mesh import make_2d_mesh, make_mesh
from gymca_tpu.parallel.spatial_env import (
    advanced_step_batched_spatial,
    advanced_step_spatial,
    bulldozer_step_batched_spatial,
    bulldozer_step_spatial,
    shard_state,
    shard_state_batched,
)


class TestBulldozerSpatial:
    @pytest.mark.parametrize("n_devices", [2, 4])
    def test_bit_parity_with_core_step(self, key, n_devices):
        core = BulldozerCore(64, 64)
        assert core.repeater.max_repeats == 1
        mesh = make_mesh(n_devices)

        state_a = core.initial_state(key)
        state_b = shard_state(state_a, mesh)
        step_one = jax.jit(core.step)
        step_sh = jax.jit(
            lambda s, a: bulldozer_step_spatial(core, s, a, mesh)
        )

        k_act = jax.random.fold_in(key, 1)
        for i in range(25):
            k_act, k1, k2 = jax.random.split(k_act, 3)
            action = jnp.stack(
                [jax.random.randint(k1, (), 0, 9),
                 jax.random.randint(k2, (), 0, 2)]
            )
            state_a, out_a = step_one(state_a, action)
            state_b, out_b = step_sh(state_b, action)
            np.testing.assert_array_equal(
                np.asarray(state_a.grid), np.asarray(state_b.grid),
                err_msg=f"step {i}",
            )
            assert float(out_a.reward) == float(out_b.reward)
            assert bool(out_a.terminated) == bool(out_b.terminated)
            assert bool(out_a.info["hit"]) == bool(out_b.info["hit"])
            np.testing.assert_array_equal(
                np.asarray(state_a.context["position"]),
                np.asarray(state_b.context["position"]),
            )
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(state_a.key)),
                np.asarray(jax.random.key_data(state_b.key)),
            )

    def test_big_grid_sharded_episode(self, key):
        """1024^2 single grid over all 8 virtual devices: scan a short
        episode fully jitted; fire must either spread or the env must
        terminate, and reward stays in [-1, 0]."""
        core = BulldozerCore(1024, 1024)
        mesh = make_mesh(8)
        state = shard_state(core.initial_state(key), mesh)

        @jax.jit
        def run(state, k):
            def body(carry, kk):
                st, _ = carry
                k1, k2 = jax.random.split(kk)
                action = jnp.stack(
                    [jax.random.randint(k1, (), 0, 9),
                     jax.random.randint(k2, (), 0, 2)]
                )
                st, out = bulldozer_step_spatial(core, st, action, mesh)
                return (st, out.reward), out.reward

            (st, _), rewards = jax.lax.scan(
                body, (state, jnp.asarray(0.0)), jax.random.split(k, 20)
            )
            return st, rewards

        st, rewards = run(state, jax.random.fold_in(key, 2))
        r = np.asarray(rewards)
        assert np.all((r <= 0.0) & (r >= -1.0))
        assert int(st.steps_elapsed) == 20 or bool(st.done)
        # grid really is sharded over the mesh
        assert len(st.grid.sharding.device_set) == 8


class TestBatchedSpatial:
    """Batch x spatial composition on a ('data', 'space') 2-D mesh
    (VERDICT r2 #6): N envs sharded over 'data', every grid row-sharded
    over 'space'."""

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
    def test_shard_count_invariance(self, key, mesh_shape):
        """The batched 2-D-mesh step must be BIT-IDENTICAL to the
        single-device vmap(step) for ANY mesh factorization (gust rolls ride
        the replicated per-env key chain, so no RNG depends on shard
        placement)."""
        core = BulldozerCore(64, 64)
        d, s = mesh_shape
        mesh = make_2d_mesh(d, s)
        n_envs = 4

        keys = jax.random.split(key, n_envs)
        states_a = jax.vmap(core.initial_state)(keys)
        states_b = shard_state_batched(states_a, mesh)

        step_vmap = jax.jit(jax.vmap(core.step))
        step_2d = jax.jit(
            lambda st, a: bulldozer_step_batched_spatial(core, st, a, mesh)
        )

        k_act = jax.random.fold_in(key, 1)
        for i in range(15):
            k_act, k1, k2 = jax.random.split(k_act, 3)
            actions = jnp.stack(
                [jax.random.randint(k1, (n_envs,), 0, 9),
                 jax.random.randint(k2, (n_envs,), 0, 2)], axis=-1
            )
            states_a, out_a = step_vmap(states_a, actions)
            states_b, out_b = step_2d(states_b, actions)
            np.testing.assert_array_equal(
                np.asarray(states_a.grid), np.asarray(states_b.grid),
                err_msg=f"step {i} mesh {mesh_shape}",
            )
            np.testing.assert_array_equal(
                np.asarray(out_a.reward), np.asarray(out_b.reward)
            )
            np.testing.assert_array_equal(
                np.asarray(out_a.terminated), np.asarray(out_b.terminated)
            )
            np.testing.assert_array_equal(
                np.asarray(out_a.info["hit"]), np.asarray(out_b.info["hit"])
            )
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(states_a.key)),
                np.asarray(jax.random.key_data(states_b.key)),
            )
        # grids really live on all 8 devices
        assert len(states_b.grid.sharding.device_set) == 8

    def test_advanced_batched_matches_per_env_spatial(self, key):
        """Flagship physics on the 2-D mesh: stepping N envs at once on a
        (2, 4) mesh must bit-match stepping each env alone on a 4-device
        1-D spatial mesh (same shard count along rows => same
        shard-folded RNG streams)."""
        from gymca_tpu.ops.alexandridis import AlexandridisCA
        from gymca_tpu.envs.terrain import get_winds

        H = W = 32
        EMPTY, TREE, FIRE = 0, 1, 2
        ca = AlexandridisCA(H, EMPTY, TREE, FIRE, static_p_tree=0.0)
        mesh2d = make_2d_mesh(2, 4)
        mesh1d = make_mesh(4)
        n_envs = 2

        winds, fts = get_winds(True)
        shared = {
            "winds": winds, "fts": fts,
            "p_fire": jnp.asarray(0.0), "p_tree": jnp.asarray(0.0),
            "p_wind_change": jnp.asarray(0.0), "day_length": 400,
        }

        def one_env_ctx(i):
            grid = jnp.full((H, W), TREE, jnp.int32).at[16, 16 + i].set(FIRE)
            return grid, {
                "wind_index": jnp.asarray(0),
                "density": jnp.full((H, W), 3, jnp.int32),
                "vegetation": jnp.full((H, W), 3, jnp.int32),
                "altitude": jnp.zeros((H, W)),
                "slope": jnp.zeros((H, W, 3, 3)),
                "exp_slope": jnp.ones((3, 3, H, W)),
                "veg_den_factor": jnp.full((H, W), 2.0),
                "fire_age": jnp.where(grid == FIRE, 50.0, 0.0),
                "dousing_count": jnp.zeros((H, W), jnp.int32),
                "is_night": jnp.asarray(0),
                "true_grid": grid,
                "time_step": jnp.asarray(1),
                "position": jnp.asarray([4, 7 + i]),
            }

        grids, per_envs = [], []
        for i in range(n_envs):
            g, pe = one_env_ctx(i)
            grids.append(g)
            per_envs.append(pe)
        grids_b = jnp.stack(grids)
        per_envs_b = jax.tree.map(lambda *xs: jnp.stack(xs), *per_envs)
        keys = jax.random.split(key, n_envs)
        actions = jnp.asarray([[4, 1], [1, 0]])

        new_g_b, new_pe_b, rew_b, done_b = advanced_step_batched_spatial(
            ca, grids_b, per_envs_b, shared, actions, keys, mesh2d
        )
        for i in range(n_envs):
            # per-env reference on the SAME spatial shard count (the CA's
            # per-shard RNG folds by shard index, which matches)
            # both paths split the incoming key identically (k_ca = split[0])
            new_g, new_pe, rew, done = advanced_step_spatial(
                ca, grids[i], per_envs[i], shared, actions[i], keys[i], mesh1d,
            )
            np.testing.assert_array_equal(
                np.asarray(new_g_b[i]), np.asarray(new_g), err_msg=f"env {i}"
            )
            np.testing.assert_array_equal(
                np.asarray(new_pe_b["fire_age"][i]),
                np.asarray(new_pe["fire_age"]),
            )
            np.testing.assert_array_equal(
                np.asarray(new_pe_b["dousing_count"][i]),
                np.asarray(new_pe["dousing_count"]),
            )
        assert float(rew_b[0]) < 0.0
        assert not bool(done_b[0])
        assert int(new_pe_b["time_step"][0]) == 2


class TestAdvancedSpatial:
    def test_step_runs_and_douses(self, key):
        from gymca_tpu.ops.alexandridis import AlexandridisCA

        H = W = 32
        EMPTY, TREE, FIRE = 0, 1, 2
        ca = AlexandridisCA(H, EMPTY, TREE, FIRE, static_p_tree=0.0)
        mesh = make_mesh(4)

        from gymca_tpu.envs.terrain import get_winds

        winds, fts = get_winds(True)
        grid = jnp.full((H, W), TREE, jnp.int32).at[16, 16].set(FIRE)
        per_env = {
            "wind_index": jnp.asarray(0),
            "density": jnp.full((H, W), 3, jnp.int32),
            "vegetation": jnp.full((H, W), 3, jnp.int32),
            "altitude": jnp.zeros((H, W)),
            "slope": jnp.zeros((H, W, 3, 3)),
            "exp_slope": jnp.ones((3, 3, H, W)),
            "veg_den_factor": jnp.full((H, W), 2.0),
            "fire_age": jnp.where(grid == FIRE, 50.0, 0.0),
            "dousing_count": jnp.zeros((H, W), jnp.int32),
            "is_night": jnp.asarray(0),
            "true_grid": grid,
            "time_step": jnp.asarray(1),
            "position": jnp.asarray([4, 7]),
        }
        shared = {
            "winds": winds,
            "fts": fts,
            "p_fire": jnp.asarray(0.0),
            "p_tree": jnp.asarray(0.0),
            "p_wind_change": jnp.asarray(0.0),
            "day_length": 400,
        }
        action = jnp.asarray([4, 1])  # stay + douse
        new_grid, new_pe, reward, done = advanced_step_spatial(
            ca, grid, per_env, shared, action, key, mesh
        )
        assert new_grid.shape == (H, W)
        assert int(new_pe["dousing_count"][4, 7]) == 1
        assert int(new_pe["time_step"]) == 2
        assert float(reward) < 0.0 and not bool(done)
