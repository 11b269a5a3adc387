"""Orbax checkpointing with FULL training state.

The reference saves model params only, every 200 iterations
(``jax_ppo.py:1522-1527``) — optimizer state, env state and RNG are lost, so
"resume" restarts optimization.  Here a checkpoint is the complete training
state: agent TrainState (params + optimizer), PRNG key, and an optional env
carry, via orbax ``StandardSave``/``StandardRestore``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager (max_to_keep=2, like the
    reference jax_ppo.py:435-443)."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save_state(self, step: int, agent_state, key, env_carry: Any = None):
        payload = {
            "params": agent_state.params,
            "opt_state": agent_state.opt_state,
            "train_step": agent_state.step,
            "key": jax.random.key_data(key),
        }
        if env_carry is not None:
            payload["env_carry"] = env_carry
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload)
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_state(self, agent_state, key, env_carry: Any = None
                      ) -> Tuple[Any, Any]:
        """Restore into templates; returns (agent_state, key) (+ env carry if
        given a template)."""
        step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {
            "params": agent_state.params,
            "opt_state": agent_state.opt_state,
            "train_step": agent_state.step,
            "key": jax.random.key_data(key),
        }
        if env_carry is not None:
            template["env_carry"] = env_carry
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )
        new_state = agent_state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["train_step"],
        )
        new_key = jax.random.wrap_key_data(restored["key"])
        if env_carry is not None:
            return new_state, new_key, restored["env_carry"]
        return new_state, new_key

    def close(self):
        self.manager.close()
