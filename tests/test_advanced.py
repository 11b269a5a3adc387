"""AdvancedForestFireBulldozer integration tests
(counterpart of reference bulldozer/tests/test_advanced_bulldozer.py:29-126)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv


@pytest.fixture(scope="module")
def env():
    return AdvancedForestFireBulldozerEnv(
        16, 16, key=jax.random.key(0), num_envs=4, enable_extensions=True
    )


@pytest.fixture(scope="module")
def reset_pair(env):
    return env.reset()


def idle_action(n, ext=0):
    return jnp.tile(jnp.asarray([4, 0, ext], jnp.int32), (n, 1))


class TestSpaces:
    def test_action_space_shapes(self, env):
        assert env.action_space.shape == (4, 2)
        # + extension head with sum_{i<=k} C(n,i) = 1 + 2 = 3 choices
        assert env.total_action_space.shape == (4, 3)
        assert env.total_action_space.nvec[0].tolist() == [9, 2, 3]

    def test_lookup_table_shapes(self, env):
        assert env._extension_lookups[0].shape == (3, 2)


class TestResetStep:
    def test_reset_obs(self, env, reset_pair):
        (rgb, ctx), info = reset_pair
        assert rgb.shape == (4, 16, 16, 3)
        assert set(ctx.keys()) == {
            "per_env_context", "shared_context", "position", "time",
        }
        assert set(ctx["per_env_context"].keys()) == env.PER_ENV_CONTEXT_KEYS
        # two-cell fire seed per env
        tg = np.asarray(ctx["per_env_context"]["true_grid"])
        assert all((tg[i] == 2).sum() == 2 for i in range(4))
        # bulldozer at (0.15H, 0.85W)
        assert np.asarray(ctx["position"]).tolist() == [[2, 13]] * 4

    def test_step_contract(self, env, reset_pair):
        obs, info = reset_pair
        a = idle_action(4)
        obs2, reward, term, trunc, info2 = env.stateless_step(a, obs, info)
        assert obs2[0].shape == (4, 16, 16, 3)
        assert reward.shape == (4,)
        assert bool(jnp.all(reward <= 0))
        assert not bool(term.any())
        assert float(info2["steps_elapsed"][0]) == 1.0

    def test_shoot_writes_dousing(self, env, reset_pair):
        obs, info = reset_pair
        a = jnp.tile(jnp.asarray([4, 1, 0], jnp.int32), (4, 1))  # shoot
        step = env.stateless_step(a, obs, info)
        dc = step[0][1]["per_env_context"]["dousing_count"]
        assert int(dc.sum()) == 4  # one mark per env at the agent position
        pos = np.asarray(step[0][1]["position"])
        assert all(int(dc[i, pos[i, 0], pos[i, 1]]) == 1 for i in range(4))

    def test_extension_channels_gate(self, env, reset_pair):
        obs, info = reset_pair
        # Track the extended grid through a manual MDP call on env 0
        ctx = obs[1]
        pe0 = jax.tree.map(lambda x: x[0], ctx["per_env_context"])
        grid0 = pe0["true_grid"]
        pos0 = ctx["position"][0]
        # no extension: ext channels zero
        rgb, ext = env.build_observation_on_extensions(
            grid0, pos0, jnp.asarray([4, 0, 0, 0]), pe0, ctx["shared_context"]
        )
        assert ext.shape == (16, 16, 5)
        assert float(jnp.abs(ext[..., 3:]).sum()) == 0.0
        # unblur extension id 1 -> bits (1, 0): channel 3 nonzero
        rgb, ext = env.build_observation_on_extensions(
            grid0, pos0, jnp.asarray([4, 0, 1, 0]), pe0, ctx["shared_context"]
        )
        assert float(jnp.abs(ext[..., 3]).sum()) > 0.0
        assert float(jnp.abs(ext[..., 4]).sum()) == 0.0
        # during the day, unblur channel differs from the blurred base channel
        assert not bool(jnp.array_equal(ext[..., 3], ext[..., 0]))

    def test_full_actions_mapping(self, env):
        action = jnp.asarray(
            [[4, 0, 0], [4, 0, 1], [4, 0, 2], [4, 1, 2]], jnp.int32
        )
        full = env._create_full_actions(action)
        assert full.shape == (4, 4)
        assert full[:, 2:].tolist() == [[0, 0], [1, 0], [0, 1], [0, 1]]


class TestAutoReset:
    def test_conditional_reset_restores_fire(self, env, reset_pair):
        obs, info = reset_pair
        a = idle_action(4)
        # kill all fire in env 0 to force termination
        ctx = obs[1]
        tg = ctx["per_env_context"]["true_grid"]
        tg = tg.at[0].set(jnp.where(tg[0] == 2, 1, tg[0]))
        ctx["per_env_context"]["true_grid"] = tg
        obs = (obs[0], ctx)
        step = env.stateless_step(a, obs, info)
        assert bool(step[2][0])  # env 0 terminated
        obs2, reward, term, trunc, info2 = env.conditional_reset(step, a)
        assert not bool(term.any())
        tg2 = np.asarray(obs2[1]["per_env_context"]["true_grid"])
        assert (tg2[0] == 2).sum() == 2  # fresh fire seed
        assert float(info2["steps_elapsed"][0]) == 0.0
        # untouched envs keep their state
        assert (tg2[1] == 2).sum() >= 1

    def test_fresh_initial_states_differ(self, env, reset_pair):
        """Auto-reset must resample (reference freezes at trace time)."""
        obs, info = reset_pair
        a = idle_action(4)
        grids = []
        for trial in range(2):
            ctx = jax.tree.map(lambda x: x, obs[1])
            tg = ctx["per_env_context"]["true_grid"]
            tg = tg.at[0].set(jnp.where(tg[0] == 2, 1, tg[0]))
            # change the per-env key between trials
            ctx["per_env_context"]["key"] = jax.vmap(
                lambda k: jax.random.fold_in(k, trial + 100)
            )(ctx["per_env_context"]["key"])
            ctx["per_env_context"]["true_grid"] = tg
            step = env.stateless_step(a, (obs[0], ctx), info)
            obs2, *_ = env.conditional_reset(step, a)
            grids.append(np.asarray(obs2[1]["per_env_context"]["true_grid"][0]))
        assert not np.array_equal(grids[0], grids[1])


class TestRgb:
    def test_day_night_palettes_differ(self, env, reset_pair):
        obs, _ = reset_pair
        ctx = obs[1]
        pe0 = jax.tree.map(lambda x: x[0], ctx["per_env_context"])
        grid0 = pe0["true_grid"]
        pos0 = ctx["position"][0]
        day = env._grid_to_rgb(grid0, jnp.asarray(0), pe0["dousing_count"], pos0)
        night = env._grid_to_rgb(grid0, jnp.asarray(1), pe0["dousing_count"], pos0)
        assert not bool(jnp.array_equal(day, night))
        # position pixel black
        assert float(day[pos0[0], pos0[1]].sum()) == 0.0

    def test_dousing_tint(self, env, reset_pair):
        obs, _ = reset_pair
        ctx = obs[1]
        pe0 = jax.tree.map(lambda x: x[0], ctx["per_env_context"])
        grid0 = pe0["true_grid"]
        pos0 = ctx["position"][0]
        doused = pe0["dousing_count"].at[5, 5].set(1)
        rgb = env._grid_to_rgb(grid0, jnp.asarray(0), doused, pos0)
        base = env._grid_to_rgb(grid0, jnp.asarray(0), pe0["dousing_count"], pos0)
        assert not bool(jnp.array_equal(rgb[5, 5], base[5, 5]))
        # blue-dominant by day
        assert float(rgb[5, 5, 2]) > float(rgb[5, 5, 0])


def test_speed_multiplier_scales_agent_speed():
    """speed_multiplier scales the agent's per-action time cost (QUIRKS #12:
    the reference stores this knob but never consumes it; we implement the
    evident curriculum semantics).  Default 1.0 must keep the reference's
    timing model bit-identical."""
    mk = lambda m: AdvancedForestFireBulldozerEnv(
        16, 16, key=jax.random.key(0), num_envs=1, speed_multiplier=m
    )
    e1, e4 = mk(1.0), mk(4.0)
    scale = 16
    assert e1._t_act_move == pytest.approx(1 / (0.12 * scale) - 0.001)
    assert e4._t_act_move == pytest.approx(1 / (0.12 * 4 * scale) - 0.001)
    # shoot time keeps the reference's chained derivation
    assert e4._t_act_shoot == pytest.approx(
        1 / (0.03 * 4 * scale) - e4._t_act_move
    )
    # faster agent => more agent steps per CA application
    per_step_1 = e1._t_act_move + e1._t_act_shoot + e1._t_env_any
    per_step_4 = e4._t_act_move + e4._t_act_shoot + e4._t_env_any
    assert per_step_4 < per_step_1


def test_use_pallas_ca_auto_default():
    """use_pallas_ca=None (the default) auto-enables the fused CA only on a
    TPU backend AND a supported grid; on the CPU test backend it must
    resolve to the XLA path with no fallback warning (Pallas-TPU is
    interpret-only off-hardware).  Explicit False always wins."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        auto_small = AdvancedForestFireBulldozerEnv(
            16, 16, key=jax.random.key(0), num_envs=1
        )
        auto_big = AdvancedForestFireBulldozerEnv(
            128, 128, key=jax.random.key(0), num_envs=1
        )
        forced_off = AdvancedForestFireBulldozerEnv(
            128, 128, key=jax.random.key(0), num_envs=1, use_pallas_ca=False
        )
    assert auto_small.use_pallas_ca is False
    assert forced_off.use_pallas_ca is False
    expected = jax.default_backend() == "tpu"
    assert auto_big.use_pallas_ca is expected


def test_uint8_rgb_integer_path_bit_identical():
    """uint8 obs mode renders in pure integer math (round 5); it must be
    BIT-IDENTICAL to round() of the float32 path — including the
    round-half-to-even ties the 0.25/0.75 dousing blend produces (e.g.
    night empty doused red: (105 + 3*255)/4 = 217.5 -> 218)."""
    env_u8 = AdvancedForestFireBulldozerEnv(
        8, 8, key=jax.random.key(0), num_envs=1
    )
    env_f32 = AdvancedForestFireBulldozerEnv(
        8, 8, key=jax.random.key(0), num_envs=1, obs_dtype=jnp.float32
    )
    assert env_u8._obs_dtype == jnp.uint8

    # display grid covering every cell value; dousing covering 0/1/2
    vals = jnp.arange(64, dtype=jnp.float32).reshape(8, 8) % 3
    dousing = (jnp.arange(64, dtype=jnp.int32).reshape(8, 8) // 2) % 3
    pos = jnp.asarray([3, 5], jnp.int32)
    for night in (jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32)):
        u8 = env_u8._grid_to_rgb(vals, night, dousing, pos)
        f32 = env_f32._grid_to_rgb(vals, night, dousing, pos)
        assert u8.dtype == jnp.uint8 and f32.dtype == jnp.float32
        expect = np.asarray(jnp.round(f32)).astype(np.uint8)
        np.testing.assert_array_equal(np.asarray(u8), expect)
        # the tie case really is exercised
        if int(night) == 1:
            doused_empty = (np.asarray(vals) == 0) & (np.asarray(dousing) == 1)
            assert np.asarray(u8)[doused_empty][:, 0].min() == 218
