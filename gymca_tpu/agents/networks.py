"""PPO model family: IMPALA-style CNN torso + categorical actor heads + critic.

Behavioral counterpart of the reference models (``agents/jax_ppo.py``):

* ``Network`` (``jax_ppo.py:126-288``, live branch ``:266-288``): grid/255 ->
  5x5 stride-2 conv(64) -> ConvSequence(16, 32, 64) -> relu -> flatten ->
  Dense(128) -> relu.  ``ConvSequence`` = 3x3 conv + 3x3/2 maxpool + 2
  residual blocks (``:88-123``).
* ``Actor`` (``:305-356``): 2x Dense(128) -> one categorical head per action
  dim (9 moves, 2 shoot) + one head per extension registry with
  ``sum_{i<=k} C(n, i)`` combination logits.
* ``Critic`` (``:291-302``): 2x Dense(128) -> scalar value.

TPU notes: convs and denses run on the MXU; keep batch*spatial dims large.
``compute_dtype`` lets the torso run in bfloat16 (params stay f32).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax.linen.initializers import constant, orthogonal

__all__ = ["Network", "Actor", "Critic", "ResidualBlock", "ConvSequence"]


class ResidualBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inputs = x
        x = nn.relu(x)
        x = nn.Conv(
            self.channels, kernel_size=(3, 3), padding="SAME",
            kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.channels, kernel_size=(3, 3), padding="SAME",
            kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
            dtype=self.dtype,
        )(x)
        return x + inputs


class ConvSequence(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.channels, kernel_size=(3, 3), padding="SAME", dtype=self.dtype
        )(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="SAME")
        x = ResidualBlock(self.channels, dtype=self.dtype)(x)
        x = ResidualBlock(self.channels, dtype=self.dtype)(x)
        return x


class Network(nn.Module):
    """Shared CNN torso over the RGB grid observation."""

    conv_count: int = 3
    maxpool_count: int = 2
    channels: Tuple[int, ...] = (16, 32, 64)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grid):
        x = (grid / 255.0).astype(self.compute_dtype)
        x = nn.Conv(
            64, kernel_size=(5, 5), strides=(2, 2), padding="VALID",
            kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
            dtype=self.compute_dtype,
        )(x)
        x = nn.relu(x)
        for channel in self.channels:
            x = ConvSequence(channel, dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(
            128, kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
            dtype=self.compute_dtype,
        )(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)


class Critic(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(128, kernel_init=orthogonal(np.sqrt(2)),
                     bias_init=constant(0.0))(x)
        x = nn.relu(x)
        x = nn.Dense(128, kernel_init=orthogonal(np.sqrt(2)),
                     bias_init=constant(0.0))(x)
        x = nn.relu(x)
        return nn.Dense(1, kernel_init=orthogonal(1), bias_init=constant(0.0))(x)


class Actor(nn.Module):
    """Multi-head categorical actor.

    ``action_dims``: sizes of the plain categorical heads (e.g. (9, 2)).
    ``choose_k``: (n, k) per extension registry — adds a head with
    ``sum_{i<=k} C(n, i)`` combination logits (jax_ppo.py:344-354).
    """

    action_dims: Sequence[int]
    choose_k: Sequence[Tuple[int, int]] = ()

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(128, kernel_init=orthogonal(np.sqrt(2)),
                     bias_init=constant(0.0))(x)
        x = nn.relu(x)
        x = nn.Dense(128, kernel_init=orthogonal(np.sqrt(2)),
                     bias_init=constant(0.0))(x)
        x = nn.relu(x)

        logits = []
        for dim in self.action_dims:
            logits.append(
                nn.Dense(int(dim), kernel_init=orthogonal(0.01),
                         bias_init=constant(0.0))(x)
            )
        for n, k in self.choose_k:
            num_combinations = sum(math.comb(n, i) for i in range(k + 1))
            logits.append(
                nn.Dense(num_combinations, kernel_init=orthogonal(0.01),
                         bias_init=constant(0.0))(x)
            )
        return logits
