"""Data-parallel PPO over a device mesh via shard_map.

What the reference left as dead scaffolding (``jax_ppo.py:80-81, 792-853``)
made real: the env batch shards over a ``('data',)`` mesh axis, each device
steps its own env shard and computes local rollout/GAE, and PPO gradients
all-reduce with ``pmean`` over the mesh (riding ICI).  Model params stay
replicated.

Semantics note: minibatch shuffling is *per-shard* (each device permutes its
local ``T x N/D`` block).  This is the standard DP-PPO formulation; with
``pmean`` gradients it matches global-batch PPO up to minibatch composition.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gymca_tpu.agents.ppo import EpisodeStatistics, PPOTrainer

try:  # jax >= 0.6
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
except (ImportError, TypeError):  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_rep=False)

__all__ = ["DataParallelPPO"]


def _obs_specs(axis: str):
    """PartitionSpec tree for (rgb, context): per-env leaves shard, shared
    context replicates."""
    ctx_spec = {
        "per_env_context": P(axis),
        "shared_context": P(),
        "position": P(axis),
        "time": P(axis),
    }
    return (P(axis), ctx_spec)


class DataParallelPPO:
    """Wraps a PPOTrainer with a shard_map'd train iteration.

    ``env.num_envs`` must be divisible by the mesh's data-axis size.
    """

    def __init__(self, env, args, mesh: Mesh, key=None, axis_name: str = "data"):
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = mesh.shape[axis_name]
        assert args.env.num_envs % self.n_shards == 0, (
            f"num_envs={args.env.num_envs} not divisible by mesh axis "
            f"{axis_name}={self.n_shards}"
        )
        self.envs_per_shard = args.env.num_envs // self.n_shards
        self.trainer = PPOTrainer(env, args, key, axis_name=axis_name)
        self.env = env
        self.args = args

        axis = axis_name
        obs_spec = _obs_specs(axis)
        info_spec = P(axis)
        stats_spec = P(axis)  # stats carry a leading shard dim
        carry_specs = (P(), stats_spec, obs_spec, P(axis), info_spec, P(axis))
        metric_spec = P()

        def per_shard(agent_state, stats, obs, done, info, key):
            stats = jax.tree.map(lambda x: x[0], stats)  # strip shard dim
            out = self.trainer._train_iteration(
                agent_state, stats, obs, done, info, key[0]
            )
            agent_state, stats, next_obs, next_done, next_info, new_key, metrics = out
            stats = jax.tree.map(lambda x: x[None], stats)
            metrics = jax.lax.pmean(metrics, axis)
            return (agent_state, stats, next_obs, next_done, next_info,
                    new_key[None], metrics)

        self.train_iteration = jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=carry_specs,
                out_specs=carry_specs[:5] + (P(axis), metric_spec),
            )
        )

        # kickstart-CE / critic-warmup variant: ks_coef rides as a
        # replicated scalar; critic_only needs its own compiled program
        # (it is a static argument in PPOTrainer._train_iteration).
        # Built eagerly only when the args ask for those phases, so plain
        # DP-PPO pays nothing.
        def build_ks(critic_only):
            def per_shard_ks(agent_state, stats, obs, done, info, key,
                             ks_coef):
                stats = jax.tree.map(lambda x: x[0], stats)
                out = self.trainer._train_iteration(
                    agent_state, stats, obs, done, info, key[0],
                    ks_coef=ks_coef, critic_only=critic_only,
                )
                (agent_state, stats, next_obs, next_done, next_info,
                 new_key, metrics) = out
                stats = jax.tree.map(lambda x: x[None], stats)
                metrics = jax.lax.pmean(metrics, axis)
                return (agent_state, stats, next_obs, next_done, next_info,
                        new_key[None], metrics)

            return jax.jit(
                shard_map(
                    per_shard_ks,
                    mesh=mesh,
                    in_specs=carry_specs + (P(),),
                    out_specs=carry_specs[:5] + (P(axis), metric_spec),
                )
            )

        self._ks_warmup = int(getattr(args.exp, "critic_warmup_iters", 0))
        self._ks_coef0 = float(args.ppo.kickstart_coef)
        self._ks_decay = int(args.ppo.kickstart_decay_iters)
        self._iter_ks = (
            build_ks(False) if (self._ks_warmup or self._ks_coef0) else None
        )
        self._iter_warmup = build_ks(True) if self._ks_warmup else None

    # ---------------------------------------------------------------- carry init

    def init_carry(self):
        """Build the sharded training carry: reset env, place shards."""
        from gymca_tpu.parallel.mesh import shard_env_batch

        obs, info = self.env.reset()
        obs = shard_env_batch(self.mesh, obs, self.axis_name)
        info = shard_env_batch(self.mesh, info, self.axis_name)
        done = jnp.full(self.args.env.num_envs, False)

        # per-shard stats with a leading shard axis
        stats = EpisodeStatistics.create(self.envs_per_shard)
        stats = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (self.n_shards,) + x.shape), stats
        )
        keys = jax.random.split(self.trainer.key, self.n_shards)
        carry = (self.trainer.agent_state, stats, obs, done, info, keys)
        return jax.tree.map(lambda x: x, carry)

    def train(self, num_iterations: int, log_fn=None):
        """DP-PPO loop; honors the kickstart-CE / critic-warmup schedule
        (same semantics as PPOTrainer.train — CE at full strength through
        warmup, then a linear anneal to 0).  Run ``trainer.bc_pretrain``
        BEFORE this (single-device) to seed the clone; params flow into the
        sharded carry via ``init_carry``."""
        import time

        carry = self.init_carry()
        history = []
        start = time.time()
        warmup = self._ks_warmup
        ks_decay = self._ks_decay or max(num_iterations - warmup, 1)
        for iteration in range(1, num_iterations + 1):
            if self._iter_ks is not None:
                frac = max(
                    0.0, 1.0 - max(iteration - warmup - 1, 0) / ks_decay
                )
                fn = (
                    self._iter_warmup
                    if iteration <= warmup
                    else self._iter_ks
                )
                *carry, metrics = fn(
                    *carry, jnp.float32(self._ks_coef0 * frac)
                )
            else:
                *carry, metrics = self.train_iteration(*carry)
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            metrics["global_step"] = iteration * self.args.batch_size
            metrics["SPS"] = int(metrics["global_step"] / max(time.time() - start,
                                                              1e-9))
            history.append(metrics)
            if log_fn:
                log_fn(iteration, metrics)
        self.trainer.agent_state = carry[0]
        return carry[0], history
