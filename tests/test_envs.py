"""Environment integration tests (classic stack).

Covers the reference tests' intent: gym API contract (tests/test_ca_env.py),
bulldozer termination/reset invariants (bulldozer/tests/test_bulldozer.py),
helicopter behavior (helicopter/tests/test_helicopter.py), registration
smoke (tests/test_gymca.py, test_registration.py).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gymca_tpu
from gymca_tpu.core.env import autoreset_step
from gymca_tpu.envs.bulldozer import BulldozerCore, ForestFireBulldozerEnv
from gymca_tpu.envs.helicopter import ForestFireHelicopterEnv, HelicopterCore
from tests.helpers import assert_operator


class TestBulldozer:
    def test_mdp_operator_contract(self):
        core = BulldozerCore(8, 8)
        assert_operator(core.mdp, strict=True)

    def test_reset_invariants(self, key):
        core = BulldozerCore(32, 32)
        state = core.initial_state(key)
        grid = np.asarray(state.grid)
        # single fire seed, zero time (reference bulldozer tests)
        assert (grid == core._fire).sum() == 1
        assert float(state.context["time"]) == 0.0
        # fire in lower-left quadrant region, bulldozer upper-right-ish
        (fr,), (fc,) = np.nonzero(grid == core._fire)
        assert 24 <= fr <= 24 + 32 // 12 and 8 <= fc <= 8 + 32 // 12
        br, bc = np.asarray(state.context["position"])
        assert 8 <= br <= 8 + 32 // 12 and 24 <= bc <= 24 + 32 // 12

    def test_terminates_without_fire(self, key):
        core = BulldozerCore(8, 8)
        state = core.initial_state(key)
        # extinguish all fire manually
        state = state.replace(
            grid=jnp.where(state.grid == core._fire, core._tree, state.grid)
        )
        new_state, out = core.step(state, jnp.asarray([4, 0]))
        assert bool(out.terminated)

    def test_gym_api_episode(self):
        env = ForestFireBulldozerEnv(16, 16, seed=3)
        obs, info = env.reset()
        assert env.core.grid_spec.contains(np.asarray(obs[0]))
        total = 0.0
        for _ in range(8):
            obs, r, term, trunc, info = env.step(env.action_space.sample())
            total += r
            assert r <= 0.0
            assert "hit" in info
            if term:
                break
        assert env.status()["steps_elapsed"] >= 1

    def test_graceful_after_done(self, key):
        env = ForestFireBulldozerEnv(8, 8, seed=0)
        env.reset()
        # force done by zeroing fire
        env._state = env._state.replace(
            grid=jnp.zeros_like(env._state.grid), done=jnp.asarray(True)
        )
        env.done = True
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            obs, r, term, trunc, info = env.step(env.action_space.sample())
        assert r == 0.0 and term
        assert env.steps_beyond_done == 1

    def test_vmapped_batch(self, key):
        core = BulldozerCore(16, 16)
        keys = jax.random.split(key, 4)
        states = jax.vmap(core.initial_state)(keys)
        actions = jnp.tile(jnp.asarray([5, 1]), (4, 1))
        new_states, outs = jax.vmap(core.step)(states, actions)
        assert new_states.grid.shape == (4, 16, 16)
        assert outs.reward.shape == (4,)
        # batched == stacked single-env (key-deterministic single stack)
        s0 = jax.tree.map(lambda x: x[0], states)
        ns0, out0 = core.step(s0, actions[0])
        assert jnp.array_equal(new_states.grid[0], ns0.grid)

    def test_autoreset(self, key):
        core = BulldozerCore(8, 8)
        state = core.initial_state(key)
        state = state.replace(grid=jnp.zeros_like(state.grid))  # done next step
        new_state, out = autoreset_step(core, state, jnp.asarray([4, 0]))
        assert bool(out.terminated)
        # merged state is a fresh episode: has fire again, counters reset
        assert int(jnp.sum(new_state.grid == core._fire)) == 1
        assert int(new_state.steps_elapsed) == 0
        assert not bool(new_state.done)


class TestHelicopter:
    def test_mdp_operator_contract(self):
        core = HelicopterCore(8, 8)
        assert_operator(core.mdp, strict=True)

    def test_never_done_and_reward_range(self):
        env = ForestFireHelicopterEnv(8, 8, seed=1)
        env.reset()
        for _ in range(6):
            obs, r, term, trunc, info = env.step(env.action_space.sample())
            assert not term
            assert -1.0 <= r <= 1.0
            assert "hit" in info

    def test_freeze_gates_ca(self, key):
        core = HelicopterCore(8, 8, freeze=3)
        state = core.initial_state(key)
        assert int(state.context["freeze"]) == 3
        state, _ = core.step(state, jnp.asarray(4))
        assert int(state.context["freeze"]) == 2

    def test_helicopter_extinguishes(self, key):
        core = HelicopterCore(4, 4, freeze=100)  # CA frozen: only agent acts
        state = core.initial_state(key)
        grid = jnp.full((4, 4), core._tree, jnp.int32).at[2, 2].set(core._fire)
        state = state.replace(
            grid=grid, context={**state.context, "position": jnp.asarray([2, 2])}
        )
        new_state, out = core.step(state, jnp.asarray(4))  # not_move + autoshoot
        assert int(new_state.grid[2, 2]) == core._empty
        assert bool(out.info["hit"])


class TestRegistration:
    def test_catalog_parity(self):
        assert len(gymca_tpu.gymca.envs) == 2
        assert len(gymca_tpu.gymca.prototypes) == 3

    def test_gym_make(self):
        import gymnasium as gym

        for env_id in gymca_tpu.REGISTERED_CA_ENVS:
            env = gym.make(env_id)
            assert env is not None

    def test_env_checker(self):
        """gymnasium's own API contract checker on both registered envs
        (reference contract: tests/test_ca_env.py:17-75)."""
        import warnings

        import gymnasium as gym
        from gymnasium.utils.env_checker import check_env

        for env_id in gymca_tpu.REGISTERED_CA_ENVS:
            env = gym.make(env_id).unwrapped
            with warnings.catch_warnings():
                # render_mode warnings are cosmetic; API violations raise
                warnings.simplefilter("ignore")
                check_env(env, skip_render_check=True)

    def test_prototypes_across_sizes(self):
        for shape in [(5, 5), (12, 16)]:
            env = ForestFireHelicopterEnv(*shape, seed=0)
            obs, _ = env.reset()
            assert obs[0].shape == shape
