"""Gymnasium-compatible ``GridSpace`` for the classic (single-env) API layer.

API-parity port of the reference ``gym_cellular_automata/grid_space.py:11-90``
(behavioral parity, fresh implementation): a gymnasium ``Space`` over integer
lattices built from ``n`` or explicit ``values`` with optional sampling
``probs``.  This lives in the *adapter* layer only — the functional TPU core
uses :class:`gymca_tpu.core.spaces.GridSpec` instead.
"""

from __future__ import annotations

from functools import reduce
from operator import mul
from typing import Optional, Sequence

import numpy as np
from gymnasium.spaces import Space

__all__ = ["GridSpace"]


class GridSpace(Space):
    """A gymnasium Space for cellular-automaton lattices.

    Example::

        >>> GridSpace(n=3, shape=(2, 2))
        >>> GridSpace(values=[-1, 0, 1], shape=(2, 2))
    """

    def __init__(
        self,
        n: Optional[int] = None,
        values: Optional[Sequence[int]] = None,
        shape: tuple = (),
        probs: Optional[Sequence[float]] = None,
        dtype=np.int32,
        seed: Optional[int] = None,
    ):
        super().__init__(shape, dtype, seed)

        assert shape, "Shape must be a non-empty tuple."

        if values is not None:
            self._from_values = True
            self.values = np.unique(np.array(values, dtype=dtype))
            self.n = len(self.values)
        elif n is not None:
            self._from_values = False
            assert n > 0, "'n' must be a positive integer."
            self.n = n
            self.values = np.arange(self.n, dtype=dtype)
        else:
            raise ValueError("'n' or 'values' must be provided.")

        self.probs = (
            np.repeat(1.0, self.n) / self.n if probs is None else np.asarray(probs)
        )
        assert len(self.values) == len(self.probs), (
            "Unique values do NOT MATCH with assigned probabilities."
        )
        self.size = reduce(mul, self.shape)

    def sample(self) -> np.ndarray:
        return self.np_random.choice(
            a=self.values, size=self.size, p=self.probs
        ).reshape(self.shape)

    def contains(self, x) -> bool:
        if isinstance(x, list):
            x = np.array(x, dtype=self.dtype)
        x = np.asarray(x)
        return set(np.unique(x).tolist()).issubset(
            set(self.values.tolist())
        ) and self.shape == tuple(x.shape)

    def __repr__(self):
        if self._from_values:
            return f"GridSpace(values={self.values}, shape={self.shape})"
        return f"GridSpace(n={self.n}, shape={self.shape})"

    def __eq__(self, other):
        return (
            isinstance(other, GridSpace)
            and (self.shape == other.shape)
            and self.values.shape == other.values.shape
            and bool(np.all(self.values == other.values))
        )

    @property
    def is_np_flattenable(self):
        return True


def _register_flatten():
    """Register ``gym.spaces.flatten`` support for GridSpace.

    Mirrors reference ``registration.py:60-62``.
    """
    from gymnasium.spaces import flatten
    from gymnasium.spaces.utils import flatdim, unflatten

    @flatten.register(GridSpace)
    def _flatten_grid_space(space, x):
        return np.asarray(x, dtype=space.dtype).flatten()

    @flatdim.register(GridSpace)
    def _flatdim_grid_space(space):
        return int(space.size)

    @unflatten.register(GridSpace)
    def _unflatten_grid_space(space, x):
        return np.asarray(x, dtype=space.dtype).reshape(space.shape)


_register_flatten()
