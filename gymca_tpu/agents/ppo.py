"""PPO trainer — CleanRL-derived, fully on-device.

Behavioral counterpart of reference ``agents/jax_ppo.py`` (rollout scan ->
GAE reverse scan -> epoch/minibatch update scans, Gumbel action sampling,
per-head categorical losses, in-jit episode statistics with a last-10 ring
buffer and day/night extension-accuracy accounting).

TPU-first redesign:

* **One fused jit program per iteration** (`train_iteration`): rollout,
  GAE and all update epochs compile into a single XLA program — the
  reference crosses host<->device every iteration block and logs with
  per-scalar ``.item()`` syncs (``jax_ppo.py:1385-1511``); here metrics leave
  the device once per iteration as a single pytree.
* **Full-state checkpointing**: params + optimizer state + env state + PRNG
  key (the reference checkpoints params only, ``jax_ppo.py:1522-1527``, so
  cannot truly resume).
* Data-parallel scaling lives in ``gymca_tpu.parallel`` (mesh + shard_map);
  this module is mesh-agnostic.
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Any, Callable, Optional

import flax
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from gymca_tpu.agents.args import Args
from gymca_tpu.agents.networks import Actor, Critic, Network

__all__ = ["Storage", "EpisodeStatistics", "PPOTrainer", "run_rollout_loop",
           "load_actor"]

RECENT = 10  # ring-buffer length (reference jax_ppo.py:488)


@flax.struct.dataclass
class Storage:
    grid_obs: jnp.ndarray
    position_obs: jnp.ndarray
    actions: jnp.ndarray
    logprobs: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    advantages: jnp.ndarray
    returns: jnp.ndarray
    rewards: jnp.ndarray
    # demonstrator actions for the kickstart CE term (zeros when
    # kickstart_coef == 0; same (N, heads) shape as ``actions``)
    demo_actions: jnp.ndarray


@flax.struct.dataclass
class EpisodeStatistics:
    episode_returns: jnp.ndarray
    episode_lengths: jnp.ndarray
    returned_episode_returns: jnp.ndarray
    returned_episode_lengths: jnp.ndarray
    amount_finished: jnp.ndarray
    recent_returns: jnp.ndarray
    recent_lengths: jnp.ndarray
    recent_idx: jnp.ndarray
    current_day_correct: jnp.ndarray
    current_night_correct: jnp.ndarray
    current_day_steps: jnp.ndarray
    current_night_steps: jnp.ndarray
    recent_day_correct: jnp.ndarray
    recent_night_correct: jnp.ndarray
    recent_day_steps: jnp.ndarray
    recent_night_steps: jnp.ndarray

    @classmethod
    def create(cls, num_envs: int) -> "EpisodeStatistics":
        zf = lambda n: jnp.zeros(n, jnp.float32)
        zi = lambda n: jnp.zeros(n, jnp.int32)
        return cls(
            episode_returns=zf(num_envs),
            episode_lengths=zi(num_envs),
            returned_episode_returns=zf(num_envs),
            returned_episode_lengths=zi(num_envs),
            amount_finished=jnp.asarray(0, jnp.int32),
            recent_returns=zf(RECENT),
            recent_lengths=zi(RECENT),
            recent_idx=jnp.asarray(0, jnp.int32),
            current_day_correct=zi(num_envs),
            current_night_correct=zi(num_envs),
            current_day_steps=zi(num_envs),
            current_night_steps=zi(num_envs),
            recent_day_correct=zi(RECENT),
            recent_night_correct=zi(RECENT),
            recent_day_steps=zi(RECENT),
            recent_night_steps=zi(RECENT),
        )


def _ring_scatter(buffer, values, mask, recent_idx):
    """Scatter ``values[mask]`` into a ring buffer starting at recent_idx.

    Vectorized replacement for the reference's per-env lax.scan
    (jax_ppo.py:541-611): finished envs get consecutive ring slots; a trash
    slot absorbs the unfinished ones.
    """
    ranks = jnp.cumsum(mask) - 1
    slots = jnp.where(mask, (recent_idx + ranks) % RECENT, RECENT)
    extended = jnp.concatenate([buffer, buffer[:1]], axis=0)  # slot RECENT = trash
    extended = extended.at[slots].set(values.astype(buffer.dtype))
    return extended[:RECENT]


class PPOTrainer:
    """Owns the networks, optimizer, and the fused jitted train iteration.

    ``env`` must expose the Advanced-env API: ``reset()``,
    ``stateless_step(action, obs, info)``, ``conditional_reset(step, action)``,
    ``total_action_space`` and ``extension_choices``.
    """

    def __init__(self, env, args: Args, key=None, axis_name: Optional[str] = None):
        self.env = env
        self.args = args
        # When set, gradients/metrics are pmean'd over this mesh axis —
        # used by gymca_tpu.parallel for shard_map data parallelism.
        self.axis_name = axis_name
        key = jax.random.key(args.exp.seed) if key is None else key
        self.key, net_key, actor_key, critic_key = jax.random.split(key, 4)

        action_nvec = np.asarray(env.total_action_space.nvec[0])
        base_dims = action_nvec[:2].tolist()
        self.n_action_heads = len(action_nvec)
        # Extension day/night accuracy is only a measurement when the action
        # has extension heads AND the env actually consumes them — with
        # ``enable_extensions=False`` the head still exists in the action
        # space but is inert, so "accuracy" would just count policy noise
        # (and if the head were absent, action[:, -1] would silently read
        # the SHOOT column — the reference's latent bug, jax_ppo.py:524).
        self._track_extension_accuracy = self.n_action_heads > 2 and bool(
            getattr(env, "enable_extensions", True)
        )

        self.network = Network(
            conv_count=args.exp.conv_count,
            maxpool_count=args.exp.maxpool_count,
            compute_dtype=jnp.bfloat16 if args.exp.bf16_compute else jnp.float32,
        )
        self.actor = Actor(
            action_dims=tuple(base_dims),
            choose_k=tuple(env.extension_choices),
        )
        self.critic = Critic()

        self.position_features = bool(args.exp.position_features)
        self.centroid_features = bool(
            getattr(args.exp, "centroid_features", False)
        )
        self._use_features = self.position_features or self.centroid_features
        self._shaping = (
            args.ppo.shape_tree_coef != 0.0
            or args.ppo.shape_dist_coef != 0.0
            or args.ppo.shape_douse_coef != 0.0
        )
        self._kickstart = args.ppo.kickstart_coef != 0.0

        obs, _ = env.reset()
        grid_sample = obs[0][:1]
        network_params = self.network.init(net_key, grid_sample)
        hidden = self.network.apply(network_params, grid_sample)
        if self._use_features:
            hidden = jnp.concatenate(
                [hidden, self._policy_features(obs[1])[:1]], axis=-1
            )
        actor_params = self.actor.init(actor_key, hidden)
        critic_params = self.critic.init(critic_key, hidden)

        def linear_schedule(count):
            # anneal after each (num_minibatches * update_epochs) grad updates
            # (jax_ppo.py:677-702); clamped at 0 so a count beyond the
            # planned horizon (e.g. a restored/carried optimizer state) can
            # never produce a NEGATIVE learning rate
            frac = 1.0 - (
                count // (args.ppo.num_minibatches * args.ppo.update_epochs)
            ) / max(args.num_iterations, 1)
            return args.ppo.learning_rate * jnp.maximum(frac, 0.0)

        self.agent_state = TrainState.create(
            apply_fn=None,
            params=flax.core.freeze(
                {
                    "network_params": network_params,
                    "actor_params": actor_params,
                    "critic_params": critic_params,
                }
            ),
            tx=optax.chain(
                optax.clip_by_global_norm(args.ppo.max_grad_norm),
                optax.inject_hyperparams(optax.adam)(
                    learning_rate=(
                        linear_schedule if args.ppo.anneal_lr
                        else args.ppo.learning_rate
                    ),
                    eps=1e-5,
                ),
            ),
        )
        self.param_counts = {
            "network": sum(x.size for x in jax.tree.leaves(network_params)),
            "actor": sum(x.size for x in jax.tree.leaves(actor_params)),
            "critic": sum(x.size for x in jax.tree.leaves(critic_params)),
        }

        self.train_iteration = jax.jit(
            self._train_iteration, static_argnames=("critic_only",)
        )

    # ----------------------------------------------------------- policy fns

    def _policy_features(self, context):
        """Auxiliary policy/value input features, already normalized:

        * ``position_features`` — agent (row/H, col/W);
        * ``centroid_features`` — agent->fire-centroid offset + a
          fire-present flag, from the TRUE grid (a state feature used to
          isolate perception failures; see args.py).

        Returns (N, F) f32, or None when no feature flag is on.
        """
        if not self._use_features:
            return None
        scale = jnp.asarray([self.env.nrows, self.env.ncols], jnp.float32)
        pos = context["position"].astype(jnp.float32)
        feats = []
        if self.position_features:
            feats.append(pos / scale)
        if self.centroid_features:
            tg = context["per_env_context"]["true_grid"]
            fire = (tg == self.env._fire).astype(jnp.float32)
            h, w = tg.shape[-2], tg.shape[-1]
            tot = fire.sum((-2, -1))
            denom = jnp.maximum(tot, 1.0)
            rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            cr = (fire * rows).sum((-2, -1)) / denom
            cc = (fire * cols).sum((-2, -1)) / denom
            has_fire = (tot > 0).astype(jnp.float32)
            feats.append(
                jnp.stack(
                    [
                        has_fire * (cr - pos[:, 0]) / h,
                        has_fire * (cc - pos[:, 1]) / w,
                        has_fire,
                    ],
                    axis=-1,
                )
            )
        return jnp.concatenate(feats, axis=-1)

    def _torso(self, params, grid, feats):
        """CNN hidden, optionally augmented with the pre-computed policy
        features from :meth:`_policy_features`."""
        hidden = self.network.apply(params["network_params"], grid)
        if self._use_features:
            hidden = jnp.concatenate([hidden, feats], axis=-1)
        return hidden

    def get_action_and_value(self, agent_state, obs, key):
        """Sample per-head actions via the Gumbel trick (jax_ppo.py:866-899)."""
        grid_obs, context = obs
        hidden = self._torso(
            agent_state.params, grid_obs, self._policy_features(context)
        )
        logits_set = self.actor.apply(agent_state.params["actor_params"], hidden)

        actions, logprobs = [], []
        for logits in logits_set:
            key, subkey = jax.random.split(key)
            u = jax.random.uniform(subkey, logits.shape)
            action = jnp.argmax(logits - jnp.log(-jnp.log(u)), axis=-1)
            logprob = jax.nn.log_softmax(logits)[
                jnp.arange(action.shape[0]), action
            ]
            actions.append(action)
            logprobs.append(logprob)
        actions = jnp.stack(actions, axis=1).astype(jnp.int32)
        logprobs = jnp.stack(logprobs, axis=1)
        value = self.critic.apply(agent_state.params["critic_params"], hidden)
        return actions, logprobs, value.squeeze(-1), key

    def get_action_and_value2(self, params, x, action, demo_action=None):
        """Logprob/entropy/value of given actions (jax_ppo.py:901-930).

        When ``demo_action`` is given, additionally returns the summed
        log-probability of the demonstrator's move/shoot actions (the
        kickstart CE term reuses the per-head log_softmax already computed)."""
        grid, position = x
        hidden = self._torso(params, grid, position)
        logits_set = self.actor.apply(params["actor_params"], hidden)

        logprobs, entropies = [], []
        demo_logp = 0.0
        for i, logit in enumerate(logits_set):
            act = action[:, i]
            lsm = jax.nn.log_softmax(logit)
            logprob = lsm[jnp.arange(act.shape[0]), act]
            if demo_action is not None and i < 2:
                demo_logp = demo_logp + lsm[
                    jnp.arange(act.shape[0]), demo_action[:, i]
                ]
            logits = logit - jax.scipy.special.logsumexp(logit, axis=-1,
                                                         keepdims=True)
            logits = logits.clip(min=jnp.finfo(logits.dtype).min)
            p_log_p = logits * jax.nn.softmax(logits)
            entropies.append(-p_log_p.sum(-1))
            logprobs.append(logprob)
        logprobs = jnp.stack(logprobs, axis=1)
        entropies = jnp.stack(entropies, axis=1)
        value = self.critic.apply(params["critic_params"], hidden).squeeze(-1)
        if demo_action is not None:
            return logprobs, entropies, value, demo_logp
        return logprobs, entropies, value

    # -------------------------------------------------------------- episode stats

    def _update_episode_stats(self, stats, action, obs, next_info):
        is_night = obs[1]["per_env_context"]["is_night"]
        # correct extension: see-invisible-fires (2) by day, unblur (1) by night
        # (jax_ppo.py:524-531); gated — see _track_extension_accuracy in
        # __init__.
        if self._track_extension_accuracy:
            ext_action = action[:, -1]
            day_correct = ((1 - is_night) * (ext_action == 2)).astype(jnp.int32)
            night_correct = (is_night * (ext_action == 1)).astype(jnp.int32)
        else:
            day_correct = jnp.zeros_like(is_night, dtype=jnp.int32)
            night_correct = jnp.zeros_like(is_night, dtype=jnp.int32)

        new_return = stats.episode_returns + next_info["reward"]
        new_length = stats.episode_lengths + 1
        finished = (
            next_info["terminated"] | next_info["TimeLimit.truncated"]
        )

        cur_day_correct = stats.current_day_correct + day_correct
        cur_night_correct = stats.current_night_correct + night_correct
        cur_day_steps = stats.current_day_steps + (1 - is_night).astype(jnp.int32)
        cur_night_steps = stats.current_night_steps + is_night.astype(jnp.int32)

        idx = stats.recent_idx
        num_finished = jnp.sum(finished).astype(jnp.int32)
        rs = partial(_ring_scatter, mask=finished, recent_idx=idx)
        stats = stats.replace(
            recent_returns=rs(stats.recent_returns, new_return),
            recent_lengths=rs(stats.recent_lengths, new_length),
            recent_day_correct=rs(stats.recent_day_correct, cur_day_correct),
            recent_night_correct=rs(stats.recent_night_correct, cur_night_correct),
            recent_day_steps=rs(stats.recent_day_steps, cur_day_steps),
            recent_night_steps=rs(stats.recent_night_steps, cur_night_steps),
            recent_idx=(idx + num_finished) % RECENT,
            amount_finished=stats.amount_finished
            + jnp.sum(next_info["terminated"]).astype(jnp.int32),
            episode_returns=new_return * (1 - finished),
            episode_lengths=(new_length * (1 - finished)).astype(jnp.int32),
            returned_episode_returns=jnp.where(
                finished, new_return, stats.returned_episode_returns
            ),
            returned_episode_lengths=jnp.where(
                finished, new_length, stats.returned_episode_lengths
            ).astype(jnp.int32),
            current_day_correct=cur_day_correct * (1 - finished),
            current_night_correct=cur_night_correct * (1 - finished),
            current_day_steps=cur_day_steps * (1 - finished),
            current_night_steps=cur_night_steps * (1 - finished),
        )
        return stats

    # ----------------------------------------------------------------- rollout

    def _potential(self, context):
        """Shaping potential phi(s) per env (see PPOArgs.shape_*_coef).

        phi = tree_coef * trees_fraction - dist_coef * dist(agent, fire
        centroid)/diag.  Computed from the true grid + position — a few
        full-grid reductions, negligible next to the CNN forward."""
        pe = context["per_env_context"]
        tg = pe["true_grid"]
        h, w = tg.shape[-2], tg.shape[-1]
        phi = jnp.zeros(tg.shape[0], jnp.float32)
        tree_c = self.args.ppo.shape_tree_coef
        dist_c = self.args.ppo.shape_dist_coef
        if tree_c != 0.0:
            trees = jnp.sum(tg == self.env._tree, axis=(-2, -1))
            phi = phi + tree_c * trees.astype(jnp.float32) / (h * w)
        if dist_c != 0.0:
            fire = (tg == self.env._fire).astype(jnp.float32)
            tot = fire.sum((-2, -1))
            rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            denom = jnp.maximum(tot, 1.0)
            cr = (fire * rows).sum((-2, -1)) / denom
            cc = (fire * cols).sum((-2, -1)) / denom
            pos = context["position"].astype(jnp.float32)
            dist = jnp.sqrt(
                (cr - pos[:, 0]) ** 2 + (cc - pos[:, 1]) ** 2
            ) / math.sqrt(h * h + w * w)
            phi = phi - dist_c * jnp.where(tot > 0, dist, 0.0)
        douse_c = self.args.ppo.shape_douse_coef
        if douse_c != 0.0:
            # doused cells whose 5x5 suppression box (the dousing kernel's
            # reach, ops/alexandridis.py) contains live fire = dousing that
            # is DOING something.  Dilate fire by Chebyshev radius 2 and
            # intersect with the dousing mask.
            fire = (tg == self.env._fire).astype(jnp.float32)
            near_fire = jax.lax.reduce_window(
                fire, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 5, 5), window_strides=(1, 1, 1),
                padding="SAME",
            )
            doused = (pe["dousing_count"] > 0).astype(jnp.float32)
            useful = (doused * (near_fire > 0)).sum((-2, -1))
            phi = phi + douse_c * useful / 100.0
        return phi

    def _step_once(self, carry, _):
        agent_state, stats, obs, done, info, key = carry
        action, logprob, value, key = self.get_action_and_value(
            agent_state, obs, key
        )
        step_tuple = self.env.stateless_step(action, obs, info)
        next_info = step_tuple[4]
        stats = self._update_episode_stats(stats, action, obs, next_info)
        next_obs, reward, next_done, _, next_info = self.env.conditional_reset(
            step_tuple, action
        )
        train_reward = reward
        if self._shaping:
            # potential-based shaping r' = r + gamma*phi(s') - phi(s),
            # phi := 0 at terminal states (Ng et al. 1999) — the LEARNING
            # signal only; episode statistics above use the true reward.
            phi_s = self._potential(obs[1])
            phi_sp = jnp.where(
                step_tuple[2], 0.0, self._potential(step_tuple[0][1])
            )
            train_reward = reward + self.args.ppo.gamma * phi_sp - phi_s
        storage = Storage(
            grid_obs=obs[0],
            # with feature flags on, the minibatch update consumes the
            # PRE-COMPUTED feature vector (centroid features need the full
            # context, which storage does not carry)
            position_obs=(
                self._policy_features(obs[1])
                if self._use_features else obs[1]["position"]
            ),
            actions=action,
            logprobs=logprob,
            dones=done,
            values=value,
            rewards=train_reward,
            returns=jnp.zeros_like(reward),
            advantages=jnp.zeros_like(reward),
            demo_actions=(
                self._greedy_demo_action(obs[1])
                if self._kickstart else jnp.zeros_like(action)
            ),
        )
        return (agent_state, stats, next_obs, next_done, next_info, key), storage

    # -------------------------------------------------------------------- GAE

    def _compute_gae(self, agent_state, next_obs, next_done, storage):
        next_value = self.critic.apply(
            agent_state.params["critic_params"],
            self._torso(agent_state.params, next_obs[0],
                        self._policy_features(next_obs[1])),
        ).squeeze(-1)

        num_envs = storage.rewards.shape[1]
        gamma, lam = self.args.ppo.gamma, self.args.ppo.gae_lambda

        def gae_once(advantages, inp):
            nextdone, nextvalues, curvalues, reward = inp
            nextnonterminal = 1.0 - nextdone
            delta = reward + gamma * nextvalues * nextnonterminal - curvalues
            advantages = delta + gamma * lam * nextnonterminal * advantages
            return advantages, advantages

        dones = jnp.concatenate(
            [storage.dones, next_done[None, :].astype(storage.dones.dtype)], axis=0
        )
        values = jnp.concatenate([storage.values, next_value[None, :]], axis=0)
        _, advantages = jax.lax.scan(
            gae_once,
            jnp.zeros(num_envs),
            (dones[1:].astype(jnp.float32), values[1:], values[:-1],
             storage.rewards),
            reverse=True,
        )
        return storage.replace(
            advantages=advantages, returns=advantages + storage.values
        )

    # ------------------------------------------------------------------- update

    def _ppo_loss(self, params, x, a, logp, mb_advantages, mb_returns, mb_values,
                  demo_a=None, ks_coef=0.0):
        args = self.args
        if self._kickstart:
            newlogprob, entropy, newvalue, demo_logp = (
                self.get_action_and_value2(params, x, a, demo_a)
            )
        else:
            newlogprob, entropy, newvalue = self.get_action_and_value2(
                params, x, a
            )
        logratio = newlogprob - logp
        ratio = jnp.exp(logratio)
        approx_kl = ((ratio - 1) - logratio).mean()

        if args.ppo.norm_adv:
            mb_advantages = (mb_advantages - mb_advantages.mean()) / (
                mb_advantages.std() + 1e-8
            )

        pg_loss1 = -mb_advantages * ratio
        pg_loss2 = -mb_advantages * jnp.clip(
            ratio, 1 - args.ppo.clip_coef, 1 + args.ppo.clip_coef
        )
        pg_loss = jnp.maximum(pg_loss1, pg_loss2).mean()

        if args.ppo.clip_vloss:
            v_loss_unclipped = 0.5 * ((newvalue - mb_returns) ** 2).mean()
            v_clipped = mb_values + jnp.clip(
                newvalue - mb_values, -args.ppo.clip_coef, args.ppo.clip_coef
            )
            v_loss_clipped = (v_clipped - mb_returns) ** 2
            v_loss = 0.5 * jnp.maximum(v_loss_unclipped, v_loss_clipped).mean()
        else:
            v_loss = 0.5 * ((newvalue - mb_returns) ** 2).mean()

        entropy_loss = entropy.mean()
        loss = (
            pg_loss - args.ppo.ent_coef * entropy_loss
            + v_loss * args.ppo.vf_coef
        )
        if self._kickstart:
            # annealed CE toward the demonstrator on the move/shoot heads —
            # protects the BC clone from early noisy advantages + entropy pull
            loss = loss - ks_coef * demo_logp.mean()
        return loss, (pg_loss, v_loss, entropy_loss,
                      jax.lax.stop_gradient(approx_kl))

    def _update_ppo(self, agent_state, storage, key, ks_coef=0.0,
                    critic_only=False):
        args = self.args
        loss_grad_fn = jax.value_and_grad(self._ppo_loss, has_aux=True)

        def update_epoch(carry, _):
            agent_state, key = carry
            key, subkey = jax.random.split(key)

            def flatten(x):
                return x.reshape((-1,) + x.shape[2:])

            def convert_data(x):
                x = jax.random.permutation(subkey, x)
                return jnp.reshape(
                    x, (args.ppo.num_minibatches, -1) + x.shape[1:]
                )

            flat = jax.tree.map(flatten, storage)
            shuffled = jax.tree.map(convert_data, flat)
            # advantages broadcast across the action heads (jax_ppo.py:1066-1072)
            shuffled = shuffled.replace(
                advantages=jnp.repeat(
                    jnp.expand_dims(shuffled.advantages, axis=2),
                    self.n_action_heads,
                    axis=2,
                )
            )

            def update_minibatch(agent_state, mb):
                (loss, (pg_loss, v_loss, ent_loss, approx_kl)), grads = (
                    loss_grad_fn(
                        agent_state.params,
                        (mb.grid_obs, mb.position_obs),
                        mb.actions,
                        mb.logprobs,
                        mb.advantages,
                        mb.returns,
                        mb.values,
                        mb.demo_actions,
                        ks_coef,
                    )
                )
                if critic_only:
                    # critic-warmup phase: freeze the shared torso + actor
                    # (the critic head alone learns the cloned policy's
                    # values on frozen-torso features)
                    grads = flax.core.freeze({
                        "network_params": jax.tree.map(
                            jnp.zeros_like, grads["network_params"]
                        ),
                        "actor_params": jax.tree.map(
                            jnp.zeros_like, grads["actor_params"]
                        ),
                        "critic_params": grads["critic_params"],
                    })
                if self.axis_name is not None:
                    # data-parallel all-reduce over the mesh (rides ICI)
                    grads = jax.lax.pmean(grads, self.axis_name)
                    (loss, pg_loss, v_loss, ent_loss, approx_kl) = jax.lax.pmean(
                        (loss, pg_loss, v_loss, ent_loss, approx_kl),
                        self.axis_name,
                    )
                agent_state = agent_state.apply_gradients(grads=grads)
                return agent_state, (loss, pg_loss, v_loss, ent_loss, approx_kl)

            agent_state, metrics = jax.lax.scan(
                update_minibatch, agent_state, shuffled
            )
            return (agent_state, key), metrics

        (agent_state, key), metrics = jax.lax.scan(
            update_epoch, (agent_state, key), (), length=args.ppo.update_epochs
        )
        loss, pg_loss, v_loss, ent_loss, approx_kl = metrics
        return agent_state, {
            "loss": loss[-1, -1],
            "policy_loss": pg_loss[-1, -1],
            "value_loss": v_loss[-1, -1],
            "entropy_loss": ent_loss[-1, -1],
            "approx_kl": approx_kl[-1, -1],
        }, key

    # --------------------------------------------------------------- iteration

    def _train_iteration(self, agent_state, stats, obs, done, info, key,
                         ks_coef=0.0, critic_only=False):
        """rollout -> GAE -> update, as ONE jitted program.

        ``ks_coef`` (traced scalar) anneals the kickstart CE; ``critic_only``
        (static) freezes torso+actor during the critic-warmup phase.  Both
        default to the plain-PPO path so the 6-arg call signature used by
        tests and gymca_tpu.parallel is unchanged."""
        (agent_state, stats, next_obs, next_done, next_info, key), storage = (
            jax.lax.scan(
                self._step_once,
                (agent_state, stats, obs, done, info, key),
                (),
                length=self.args.exp.num_ppo_steps,
            )
        )
        storage = self._compute_gae(agent_state, next_obs, next_done, storage)
        agent_state, losses, key = self._update_ppo(
            agent_state, storage, key, ks_coef, critic_only
        )

        metrics = dict(losses)
        metrics["episodic_return"] = stats.returned_episode_returns.mean()
        metrics["episodic_length"] = stats.returned_episode_lengths.astype(
            jnp.float32
        ).mean()
        metrics["games_finished"] = stats.amount_finished
        metrics["recent_return"] = stats.recent_returns.mean()
        metrics["recent_length"] = stats.recent_lengths.astype(jnp.float32).mean()
        if self._track_extension_accuracy:
            metrics["day_accuracy"] = stats.recent_day_correct.sum() / jnp.maximum(
                stats.recent_day_steps.sum(), 1
            )
            metrics["night_accuracy"] = (
                stats.recent_night_correct.sum()
                / jnp.maximum(stats.recent_night_steps.sum(), 1)
            )
        # extensions inert -> the keys are simply absent rather than a fake
        # 0% a plot could mistake for a measurement
        metrics["mean_reward"] = storage.rewards.mean()
        return agent_state, stats, next_obs, next_done, next_info, key, metrics

    # ------------------------------------------------------------ BC warm-start

    def _greedy_demo_action(self, context):
        """The greedy-fire hand policy as a demonstrator: step toward the
        live-fire centroid, always shoot, extension heads 0.  This is the
        same policy as the ceiling probe (scripts/exp_policy_ceiling.py)
        that fully extinguishes 256² fires under modf semantics."""
        tg = context["per_env_context"]["true_grid"]
        fire = (tg == self.env._fire).astype(jnp.float32)
        h, w = tg.shape[-2], tg.shape[-1]
        tot = jnp.maximum(fire.sum((-2, -1)), 1.0)
        rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        cr = (fire * rows).sum((-2, -1)) / tot
        cc = (fire * cols).sum((-2, -1)) / tot
        pos = context["position"].astype(jnp.float32)
        dr = jnp.sign(cr - pos[:, 0]).astype(jnp.int32)
        dc = jnp.sign(cc - pos[:, 1]).astype(jnp.int32)
        move = (dr + 1) * 3 + (dc + 1)
        shoot = jnp.ones_like(move)
        heads = [move, shoot] + [
            jnp.zeros_like(move) for _ in range(self.n_action_heads - 2)
        ]
        return jnp.stack(heads, axis=1).astype(jnp.int32)

    def bc_pretrain(self, num_iterations: int, learning_rate: float = 2.5e-4,
                    log_fn: Optional[Callable[[int, dict], None]] = None):
        """Behavior-clone the torso+actor onto the greedy-fire demonstrator
        before PPO ("kickstarting").  Under modf semantics the useful
        behavior (walk hundreds of cells to the fire, then douse along the
        front) is too many on-policy steps from a random init for PPO to
        find; cloning the hand policy that provably extinguishes fires
        (docs/learning_at_scale.md §2) places the init inside the basin.

        Cross-entropy on the move/shoot heads only; the critic params and
        the PPO optimizer state are untouched (PPO then starts with fresh
        Adam moments on the cloned params).  Each iteration rolls the
        DEMONSTRATOR through the live env (num_ppo_steps × num_envs
        samples) and takes one epoch of minibatch gradient steps."""
        env = self.env
        tx = optax.adam(learning_rate)
        nmb = self.args.ppo.num_minibatches

        def bc_loss(params, grids, feats, actions):
            hidden = self._torso(params, grids, feats)
            logits_set = self.actor.apply(params["actor_params"], hidden)
            ce = 0.0
            match = 0.0
            for i, logit in enumerate(logits_set[:2]):
                logp = jax.nn.log_softmax(logit)
                idx = jnp.arange(actions.shape[0])
                ce = ce - logp[idx, actions[:, i]].mean()
                match = match + (
                    jnp.argmax(logit, axis=-1) == actions[:, i]
                ).mean()
            return ce, match / 2.0

        def bc_iteration(params, opt_state, obs, info, key):
            def step(carry, _):
                obs, info = carry
                action = self._greedy_demo_action(obs[1])
                step_tuple = env.stateless_step(action, obs, info)
                next_obs, _, _, _, next_info = env.conditional_reset(
                    step_tuple, action
                )
                feats = (
                    self._policy_features(obs[1])
                    if self._use_features else obs[1]["position"]
                )
                return (next_obs, next_info), (obs[0], feats, action)

            (obs, info), (grids, feats, actions) = jax.lax.scan(
                step, (obs, info), (),
                length=self.args.exp.num_ppo_steps,
            )

            def mbs(x):
                flat = x.reshape((-1,) + x.shape[2:])
                return flat.reshape((nmb, flat.shape[0] // nmb) + flat.shape[1:])

            def update_mb(carry, mb):
                params, opt_state = carry
                (loss, match), grads = jax.value_and_grad(
                    bc_loss, has_aux=True
                )(params, *mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, match)

            (params, opt_state), (losses, matches) = jax.lax.scan(
                update_mb, (params, opt_state),
                (mbs(grids), mbs(feats), mbs(actions)),
            )
            return params, opt_state, obs, info, key, (
                losses.mean(), matches.mean()
            )

        bc_iteration = jax.jit(bc_iteration)

        obs, info = env.reset()
        params = self.agent_state.params
        opt_state = tx.init(params)
        key = self.key
        host0 = jax.process_index() == 0
        last = {}
        for it in range(1, num_iterations + 1):
            params, opt_state, obs, info, key, (loss, match) = bc_iteration(
                params, opt_state, obs, info, key
            )
            last = {"bc_loss": float(loss), "bc_match": float(match)}
            if log_fn is not None and host0:
                log_fn(it, last)
        self.agent_state = self.agent_state.replace(params=params)
        self.key = key
        return last

    # --------------------------------------------------------------------- train

    def render_rollout(self, agent_state, num_steps: int = 64, env_idx: int = 0,
                       key=None):
        """Roll the greedy (argmax) policy and capture the RGB observation of
        one env — frames for TB/wandb video logging (reference logs rollout
        videos every 500 iterations, jax_ppo.py:1512-1520).  Off the hot
        path, but fully jitted per step."""
        import numpy as np

        if not hasattr(self, "_jit_video_step"):
            def video_step(params, obs, info):
                hidden = self._torso(
                    params, obs[0], self._policy_features(obs[1])
                )
                logits_set = self.actor.apply(params["actor_params"], hidden)
                action = jnp.stack(
                    [jnp.argmax(l, axis=-1) for l in logits_set], axis=1
                ).astype(jnp.int32)
                step_tuple = self.env.stateless_step(action, obs, info)
                obs, _, _, _, info = self.env.conditional_reset(
                    step_tuple, action
                )
                return obs, info

            self._jit_video_step = jax.jit(video_step)

        obs, info = self.env.reset()
        frames = []
        for _ in range(num_steps):
            obs, info = self._jit_video_step(agent_state.params, obs, info)
            frames.append(np.asarray(obs[0][env_idx]).astype(np.uint8))
        return np.stack(frames)

    def train(
        self,
        num_iterations: Optional[int] = None,
        log_fn: Optional[Callable[[int, dict], None]] = None,
        checkpoint_manager=None,
        video_every: int = 0,
        video_fn: Optional[Callable[[int, "np.ndarray"], None]] = None,
    ):
        """Python driver loop.  Returns (agent_state, history list)."""
        args = self.args
        num_iterations = num_iterations or args.num_iterations

        obs, info = self.env.reset()
        done = jnp.full(args.env.num_envs, False)
        stats = EpisodeStatistics.create(args.env.num_envs)
        agent_state, key = self.agent_state, self.key

        # Multi-host: every process runs the same loop (collectives inside
        # train_iteration need all of them); only host 0 writes logs,
        # checkpoints, and videos.
        host0 = jax.process_index() == 0
        history = []
        start = time.time()
        warmup = int(getattr(args.exp, "critic_warmup_iters", 0))
        ks_coef0 = float(args.ppo.kickstart_coef)
        ks_decay = int(args.ppo.kickstart_decay_iters) or max(
            num_iterations - warmup, 1
        )
        for iteration in range(1, num_iterations + 1):
            if warmup or ks_coef0:
                # kickstart CE holds at full strength through warmup, then
                # anneals linearly to 0 over ks_decay PPO iterations
                frac = max(0.0, 1.0 - max(iteration - warmup - 1, 0) / ks_decay)
                agent_state, stats, obs, done, info, key, metrics = (
                    self.train_iteration(
                        agent_state, stats, obs, done, info, key,
                        jnp.float32(ks_coef0 * frac),
                        critic_only=iteration <= warmup,
                    )
                )
            else:
                agent_state, stats, obs, done, info, key, metrics = (
                    self.train_iteration(
                        agent_state, stats, obs, done, info, key
                    )
                )
            # single host sync per iteration
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            global_step = iteration * args.batch_size
            metrics["global_step"] = global_step
            metrics["SPS"] = int(global_step / max(time.time() - start, 1e-9))
            history.append(metrics)
            if log_fn is not None and host0:
                log_fn(iteration, metrics)
            if (
                checkpoint_manager is not None
                and iteration % args.exp.checkpoint_every == 0
            ):
                # EVERY process must enter the save: orbax's multi-host save
                # is a collective (internal cross-process barrier); gating it
                # on host 0 would deadlock a 2+ process run.  Orbax itself
                # coordinates which process writes.
                checkpoint_manager.save_state(iteration, agent_state, key)
            if video_every and video_fn and host0 and iteration % video_every == 0:
                # render/write on host 0 only — safe because params are
                # replicated (fully addressable) and the rollout env state
                # is process-local.
                video_fn(iteration, self.render_rollout(agent_state))

        self.agent_state, self.key = agent_state, key
        return agent_state, history


def run_rollout_loop(env, args: Args, key=None, log_fn=None, video_every=0,
                     video_fn=None):
    """Train PPO on ``env`` (counterpart of reference jax_ppo.py:419-1530)."""
    trainer = PPOTrainer(env, args, key)
    if getattr(args.exp, "bc_iters", 0):
        trainer.bc_pretrain(args.exp.bc_iters)
    ckpt = None
    if args.exp.checkpoint_dir:
        from gymca_tpu.agents.checkpoint import CheckpointManager

        ckpt = CheckpointManager(args.exp.checkpoint_dir)
    agent_state, history = trainer.train(
        log_fn=log_fn or _default_log, checkpoint_manager=ckpt,
        video_every=video_every, video_fn=video_fn,
    )
    return trainer, agent_state, history


def _default_log(iteration, metrics):
    print(
        f"iter {iteration}: SPS={metrics['SPS']} "
        f"return={metrics['episodic_return']:.3f} "
        f"loss={metrics['loss']:.4f} kl={metrics['approx_kl']:.4f}"
    )


def load_actor(params_path: str, env, args: Optional[Args] = None):
    """Restore the latest checkpoint and return a greedy policy
    (counterpart of reference jax_ppo.py:1533-1641).

    ``args`` must carry the same model hyperparameters (conv_count, ...)
    the checkpoint was trained with; defaults otherwise."""
    from gymca_tpu.agents.checkpoint import CheckpointManager

    args = args or Args()
    args.env.num_envs = env.num_envs
    trainer = PPOTrainer(env, args)
    ckpt = CheckpointManager(params_path)
    agent_state, _ = ckpt.restore_state(trainer.agent_state, trainer.key)

    actor = trainer.actor

    @jax.jit
    def get_action(obs_grid, context=None):
        """Greedy action.  ``context`` (the obs[1] pytree) is required iff
        the checkpoint was trained with position/centroid features."""
        if trainer._use_features and context is None:
            raise ValueError(
                "this checkpoint was trained with policy features "
                "(position/centroid); pass obs[1] as the second argument"
            )
        feats = trainer._policy_features(context) if context is not None \
            else None
        hidden = trainer._torso(agent_state.params, obs_grid, feats)
        logits_set = actor.apply(agent_state.params["actor_params"], hidden)
        return jnp.stack(
            [jnp.argmax(l, axis=-1) for l in logits_set], axis=1
        ).astype(jnp.int32)

    return get_action
