"""Seed determinism across every stack level — a gap the reference itself
acknowledges (its ``todo.md``: operator/env seed determinism untested)."""

import jax
import jax.numpy as jnp
import numpy as np

from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
from gymca_tpu.envs.bulldozer import BulldozerCore, ForestFireBulldozerEnv
from gymca_tpu.envs.helicopter import ForestFireHelicopterEnv
from gymca_tpu.ops.windy import windy_step


def _tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x, y = jax.random.key_data(x), jax.random.key_data(y)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_operator_seed_determinism(key):
    grid = jax.random.choice(key, jnp.asarray([0, 3, 25]), (16, 16)).astype(
        jnp.int32
    )
    wind = jnp.full((3, 3), 0.5)
    k = jax.random.fold_in(key, 1)
    a = windy_step(grid, wind, k, empty=0, tree=3, fire=25)
    b = windy_step(grid, wind, k, empty=0, tree=3, fire=25)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_core_trajectory_determinism(key):
    core = BulldozerCore(16, 16)

    def run(seed_key):
        state = core.initial_state(seed_key)
        outs = []
        for i in range(6):
            a = jnp.asarray([i % 9, i % 2], jnp.int32)
            state, out = core.step(state, a)
            outs.append((out.reward, out.terminated))
        return state, outs

    s1, o1 = run(key)
    s2, o2 = run(key)
    _tree_equal(s1, s2)
    for (r1, t1), (r2, t2) in zip(o1, o2):
        assert float(r1) == float(r2) and bool(t1) == bool(t2)


def test_gym_env_seed_determinism():
    for cls, shape in ((ForestFireHelicopterEnv, (8, 8)),
                       (ForestFireBulldozerEnv, (12, 12))):
        e1, e2 = cls(*shape), cls(*shape)
        o1, _ = e1.reset(seed=11)
        o2, _ = e2.reset(seed=11)
        np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
        for i in range(5):
            a = e1.action_space.sample()  # both step the same action
            r1 = e1.step(a)
            r2 = e2.step(a)
            np.testing.assert_array_equal(np.asarray(r1[0][0]),
                                          np.asarray(r2[0][0]))
            assert r1[1] == r2[1]
        # different seed -> different initial grid
        o3, _ = e1.reset(seed=12)
        assert not np.array_equal(np.asarray(o1[0]), np.asarray(o3[0]))


def test_advanced_reset_determinism():
    e1 = AdvancedForestFireBulldozerEnv(16, 16, key=jax.random.key(5), num_envs=2)
    e2 = AdvancedForestFireBulldozerEnv(16, 16, key=jax.random.key(5), num_envs=2)
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    np.testing.assert_array_equal(
        np.asarray(o1[1]["per_env_context"]["true_grid"]),
        np.asarray(o2[1]["per_env_context"]["true_grid"]),
    )
    # terrain reproducible per construction key
    np.testing.assert_array_equal(np.asarray(e1._altitude), np.asarray(e2._altitude))
