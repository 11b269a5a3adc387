"""End-to-end spatially-sharded env steps (virtual 8-device CPU mesh).

The full Bulldozer step on a row-sharded grid must be BIT-IDENTICAL to the
single-device ``BulldozerCore.step`` under the same key (the gust roll is
global/replicated; all randomness is in the replicated key chain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.envs.bulldozer import BulldozerCore
from gymca_tpu.parallel.mesh import make_mesh
from gymca_tpu.parallel.spatial_env import (
    advanced_step_spatial,
    bulldozer_step_spatial,
    shard_state,
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
