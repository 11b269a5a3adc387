"""PPO trainer tests: iteration contract, GAE vs numpy oracle, checkpoint
round-trip, load_actor, determinism (SURVEY.md §4 gaps: the reference's JAX
training stack has no dedicated unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.agents.args import (
    Args,
    EnvArgs,
    ExperimentArgs,
    PPOArgs,
    VisualizationArgs,
)
from gymca_tpu.agents.ppo import EpisodeStatistics, PPOTrainer
from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

N_ENVS, SIZE = 4, 16


def small_args(**exp_kw):
    return Args(
        ppo=PPOArgs(num_minibatches=2, update_epochs=2),
        env=EnvArgs(num_envs=N_ENVS, size=SIZE),
        viz=VisualizationArgs(),
        exp=ExperimentArgs(
            total_timesteps=N_ENVS * 8 * 4, num_ppo_steps=8, seed=3, **exp_kw
        ),
    )


@pytest.fixture(scope="module")
def env():
    return AdvancedForestFireBulldozerEnv(
        SIZE, SIZE, key=jax.random.key(0), num_envs=N_ENVS
    )


@pytest.fixture(scope="module")
def trainer(env):
    return PPOTrainer(env, small_args(), jax.random.key(1))


def _carry(trainer, env):
    obs, info = env.reset()
    done = jnp.full(N_ENVS, False)
    stats = EpisodeStatistics.create(N_ENVS)
    return trainer.agent_state, stats, obs, done, info, trainer.key


def test_train_iteration_contract(trainer, env):
    st, stats, obs, done, info, key = _carry(trainer, env)
    out = trainer.train_iteration(st, stats, obs, done, info, key)
    st2, stats2, obs2, done2, info2, key2, metrics = out
    for k in ("loss", "policy_loss", "value_loss", "entropy_loss", "approx_kl",
              "episodic_return"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    leaves0 = jax.tree.leaves(st.params)
    leaves1 = jax.tree.leaves(st2.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )
    assert int(st2.step) > int(st.step)


def test_train_iteration_deterministic(trainer, env):
    """Same carry -> bit-identical metrics (pure function)."""
    carry = _carry(trainer, env)
    m1 = trainer.train_iteration(*carry)[-1]
    m2 = trainer.train_iteration(*carry)[-1]
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_gae_matches_numpy_oracle(trainer):
    """GAE reverse scan == straightforward numpy recurrence."""
    T, N = 6, N_ENVS
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random((T, N)) < 0.2).astype(np.float32)
    next_value = rng.normal(size=(N,)).astype(np.float32)
    next_done = (rng.random(N) < 0.2).astype(np.float32)
    gamma, lam = trainer.args.ppo.gamma, trainer.args.ppo.gae_lambda

    # numpy oracle (CleanRL formulation)
    adv = np.zeros((T, N), np.float32)
    lastgaelam = np.zeros(N, np.float32)
    for t in reversed(range(T)):
        if t == T - 1:
            nextnonterminal = 1.0 - next_done
            nextvalues = next_value
        else:
            nextnonterminal = 1.0 - dones[t + 1]
            nextvalues = values[t + 1]
        delta = rewards[t] + gamma * nextvalues * nextnonterminal - values[t]
        lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam
        adv[t] = lastgaelam

    # drive the trainer's scan with the same quantities
    from gymca_tpu.agents.ppo import Storage

    storage = Storage(
        grid_obs=jnp.zeros((T, N, 1)),
        position_obs=jnp.zeros((T, N, 2)),
        actions=jnp.zeros((T, N, 2), jnp.int32),
        logprobs=jnp.zeros((T, N)),
        dones=jnp.asarray(dones),
        values=jnp.asarray(values),
        rewards=jnp.asarray(rewards),
        returns=jnp.zeros((T, N)),
        advantages=jnp.zeros((T, N)),
        demo_actions=jnp.zeros((T, N, 2), jnp.int32),
    )

    def gae_once(advantages, inp):
        nextdone, nextvalues, curvalues, reward = inp
        nextnonterminal = 1.0 - nextdone
        delta = reward + gamma * nextvalues * nextnonterminal - curvalues
        advantages = delta + gamma * lam * nextnonterminal * advantages
        return advantages, advantages

    dd = jnp.concatenate([storage.dones, next_done[None]], axis=0)
    vv = jnp.concatenate([storage.values, next_value[None]], axis=0)
    _, advantages = jax.lax.scan(
        gae_once, jnp.zeros(N),
        (dd[1:].astype(jnp.float32), vv[1:], vv[:-1], storage.rewards),
        reverse=True,
    )
    np.testing.assert_allclose(np.asarray(advantages), adv, rtol=2e-5, atol=2e-5)


def test_checkpoint_roundtrip(tmp_path, trainer, env):
    from gymca_tpu.agents.checkpoint import CheckpointManager

    st, stats, obs, done, info, key = _carry(trainer, env)
    out = trainer.train_iteration(st, stats, obs, done, info, key)
    st2, key2 = out[0], out[5]

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save_state(7, st2, key2)
    assert mgr.latest_step() == 7

    restored, rkey = mgr.restore_state(trainer.agent_state, trainer.key)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(st2.step)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rkey)),
        np.asarray(jax.random.key_data(key2)),
    )
    mgr.close()


def test_load_actor_greedy(tmp_path, trainer, env):
    from gymca_tpu.agents.checkpoint import CheckpointManager
    from gymca_tpu.agents.ppo import load_actor

    mgr = CheckpointManager(str(tmp_path / "ckpt2"))
    mgr.save_state(1, trainer.agent_state, trainer.key)
    mgr.close()

    get_action = load_actor(str(tmp_path / "ckpt2"), env)
    obs, _ = env.reset()
    a1 = get_action(obs[0])
    a2 = get_action(obs[0])
    assert a1.shape[0] == N_ENVS and a1.shape[1] >= 2
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # greedy
    assert (np.asarray(a1)[:, 0] < 9).all() and (np.asarray(a1)[:, 1] < 2).all()


def test_extension_accuracy_gated_off(trainer, env):
    """enable_extensions=False (module fixture default): the extension head
    exists in the action space but is inert -> accuracy metrics must be
    ABSENT and the day/night correct counters must never move (regression:
    they used to count the inert head's noise as 'accuracy')."""
    assert not trainer._track_extension_accuracy
    st, stats, obs, done, info, key = _carry(trainer, env)
    out = trainer.train_iteration(st, stats, obs, done, info, key)
    stats2, metrics = out[1], out[-1]
    assert "day_accuracy" not in metrics
    assert "night_accuracy" not in metrics
    assert int(jnp.sum(stats2.current_day_correct)) == 0
    assert int(jnp.sum(stats2.current_night_correct)) == 0
    assert int(jnp.sum(stats2.recent_day_correct)) == 0
    assert int(jnp.sum(stats2.recent_night_correct)) == 0


def test_extension_accuracy_present_when_enabled():
    env = AdvancedForestFireBulldozerEnv(
        SIZE, SIZE, key=jax.random.key(0), num_envs=N_ENVS,
        enable_extensions=True,
    )
    trainer = PPOTrainer(env, small_args(), jax.random.key(1))
    assert trainer._track_extension_accuracy
    st, stats, obs, done, info, key = _carry(trainer, env)
    metrics = trainer.train_iteration(st, stats, obs, done, info, key)[-1]
    for k in ("day_accuracy", "night_accuracy"):
        assert k in metrics
        assert 0.0 <= float(metrics[k]) <= 1.0


def test_reward_shaping_and_position_features(env):
    """Potential-based shaping changes the TRAINING reward (storage) but not
    the episode statistics; position_features widens the actor/critic input
    by 2."""
    shaped = PPOTrainer(
        env,
        Args(
            ppo=PPOArgs(num_minibatches=2, update_epochs=2,
                        shape_tree_coef=1.0, shape_dist_coef=0.5),
            env=EnvArgs(num_envs=N_ENVS, size=SIZE),
            viz=VisualizationArgs(),
            exp=ExperimentArgs(total_timesteps=N_ENVS * 8 * 2, num_ppo_steps=8,
                               seed=3, position_features=True),
        ),
        jax.random.key(1),
    )
    plain = PPOTrainer(env, small_args(), jax.random.key(1))
    assert shaped._shaping and not plain._shaping

    carry = _carry(plain, env)
    m_shaped = shaped.train_iteration(shaped.agent_state, *carry[1:])[-1]
    m_plain = plain.train_iteration(plain.agent_state, *carry[1:])[-1]
    # mean_reward reflects the shaped learning signal
    assert float(m_shaped["mean_reward"]) != float(m_plain["mean_reward"])

    # actor's first Dense kernel: 128 CNN features + 2 position features
    k_shaped = jax.tree.leaves(shaped.agent_state.params["actor_params"])[1]
    k_plain = jax.tree.leaves(plain.agent_state.params["actor_params"])[1]
    assert k_shaped.shape[0] == k_plain.shape[0] + 2


def test_potential_is_policy_invariant_form(trainer, env):
    """phi is a pure function of state: same context -> same potential, and
    moving the agent toward the fire increases phi when dist_coef > 0."""
    t = PPOTrainer(
        env,
        Args(
            ppo=PPOArgs(shape_dist_coef=1.0),
            env=EnvArgs(num_envs=N_ENVS, size=SIZE),
            viz=VisualizationArgs(),
            exp=ExperimentArgs(total_timesteps=1, num_ppo_steps=8, seed=3),
        ),
        jax.random.key(1),
    )
    obs, _ = env.reset()
    ctx = obs[1]
    phi1 = t._potential(ctx)
    phi2 = t._potential(ctx)
    np.testing.assert_array_equal(np.asarray(phi1), np.asarray(phi2))

    # place the agent ON the fire centroid -> distance term vanishes
    tg = np.asarray(ctx["per_env_context"]["true_grid"])
    fire_pos = np.argwhere(tg[0] == 2)[0]
    ctx_near = dict(ctx)
    ctx_near["position"] = jnp.asarray(
        np.tile(fire_pos, (N_ENVS, 1)), jnp.int32
    )
    assert float(t._potential(ctx_near)[0]) > float(phi1[0])


def test_metrics_logger(tmp_path):
    from gymca_tpu.utils.metrics import MetricsLogger, profile_trace

    logger = MetricsLogger(log_dir=str(tmp_path / "runs"), run_name="t",
                           config={"a": 1})
    logger.log(1, {"loss": 0.5, "SPS": 100})
    logger.close()
    assert (tmp_path / "runs" / "t").exists()

    with profile_trace(False):
        pass  # no-op path


def test_bc_pretrain_clones_demonstrator(env):
    """bc_pretrain pushes the argmax policy toward the greedy-fire
    demonstrator: the move/shoot match rate rises and the final params
    differ from the init (critic params untouched)."""
    tr = PPOTrainer(env, small_args(centroid_features=True),
                    jax.random.key(5))
    params_before = tr.agent_state.params
    history = []
    tr.bc_pretrain(30, log_fn=lambda it, m: history.append(m))
    # the demo-state distribution is nonstationary over the first rollouts
    # (the agent walks toward the fire), so compare late vs early windows
    early_loss = np.mean([h["bc_loss"] for h in history[:5]])
    late = history[-1]
    assert late["bc_loss"] < early_loss, (early_loss, history)
    assert late["bc_match"] > 0.6, history
    pb, pa = params_before, tr.agent_state.params
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(pb["actor_params"]),
                        jax.tree.leaves(pa["actor_params"]))
    )
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(pb["critic_params"]),
                        jax.tree.leaves(pa["critic_params"]))
    )


def test_greedy_demo_action_contract(trainer, env):
    """Demonstrator actions: move head in 0..8 pointing toward the fire
    centroid, shoot head always 1, extension head 0."""
    obs, _ = env.reset()
    acts = np.asarray(trainer._greedy_demo_action(obs[1]))
    assert acts.shape == (N_ENVS, trainer.n_action_heads)
    assert ((acts[:, 0] >= 0) & (acts[:, 0] <= 8)).all()
    assert (acts[:, 1] == 1).all()
    if trainer.n_action_heads > 2:
        assert (acts[:, 2:] == 0).all()


def test_critic_warmup_freezes_torso_and_actor(env):
    """critic_only iterations update ONLY the critic head; torso + actor
    params are bit-identical afterwards (the critic-warmup phase of the
    kickstart recipe, docs/learning_at_scale.md §5)."""
    tr = PPOTrainer(env, small_args(), jax.random.key(9))
    st, stats, obs, done, info, key = _carry(tr, env)
    out = tr.train_iteration(st, stats, obs, done, info, key,
                             jnp.float32(0.0), critic_only=True)
    st2 = out[0]
    pb, pa = st.params, st2.params
    for sub in ("network_params", "actor_params"):
        assert all(
            np.array_equal(a, b)
            for a, b in zip(jax.tree.leaves(pb[sub]), jax.tree.leaves(pa[sub]))
        ), sub
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(pb["critic_params"]),
                        jax.tree.leaves(pa["critic_params"]))
    )


def test_kickstart_ce_pulls_toward_demonstrator(env):
    """With a large kickstart coefficient the policy's log-probability of
    the demonstrator's actions increases after an update; with coef 0 the
    loss path reduces to plain PPO (finite metrics, contract only)."""
    args = small_args(centroid_features=True)
    args.ppo.kickstart_coef = 5.0
    tr = PPOTrainer(env, args, jax.random.key(11))
    st, stats, obs, done, info, key = _carry(tr, env)

    def demo_logp(params, obs):
        demo = tr._greedy_demo_action(obs[1])
        feats = tr._policy_features(obs[1])
        _, _, _, dlp = tr.get_action_and_value2(
            params, (obs[0], feats), demo, demo
        )
        return float(dlp.mean())

    before = demo_logp(st.params, obs)
    out = tr.train_iteration(st, stats, obs, done, info, key,
                             jnp.float32(5.0))
    st2, metrics = out[0], out[-1]
    after = demo_logp(st2.params, obs)
    assert after > before, (before, after)
    assert np.isfinite(float(metrics["loss"]))


def test_train_with_warmup_and_kickstart_schedule(env):
    """End-to-end train() through the warmup -> annealed-kickstart schedule
    (3 iterations: 1 critic-only, then CE annealing) stays finite."""
    args = small_args(centroid_features=True, critic_warmup_iters=1)
    args.ppo.kickstart_coef = 1.0
    args.ppo.kickstart_decay_iters = 2
    tr = PPOTrainer(env, args, jax.random.key(13))
    _, history = tr.train(num_iterations=3)
    assert len(history) == 3
    assert all(np.isfinite(h["loss"]) for h in history)
