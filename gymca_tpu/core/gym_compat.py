"""Gymnasium adapter for lattice spaces.

The functional TPU core describes lattices with the frozen, jit-safe
:class:`gymca_tpu.core.spaces.GridSpec`.  The classic (single-env) gymnasium
API layer still needs a ``gym.Space`` object — covering the surface of the
reference's ``gym_cellular_automata/grid_space.py:11-90`` — so ``GridSpace``
here is a *thin view* over a ``GridSpec``: all value/probability bookkeeping
and containment logic live in the spec; this class only adds the stateful
gymnasium pieces (``np_random`` sampling, ``Space`` inheritance, flatten
registration).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from gymnasium.spaces import Space

from gymca_tpu.core.spaces import GridSpec

__all__ = ["GridSpace"]


class GridSpace(Space):
    """``gym.Space`` view over a :class:`GridSpec` lattice description.

    Construct from a cell count or an explicit cell-value list::

        GridSpace(n=3, shape=(2, 2))
        GridSpace(values=[0, 3, 25], shape=(2, 2), probs=[0.1, 0.9, 0.0])
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
        spec = GridSpec(
            shape=tuple(shape),
            n=n,
            values=None if values is None else tuple(int(v) for v in values),
            probs=None if probs is None else tuple(probs),
            dtype=dtype,
        )
        self._spec = spec
        self._named_by_values = values is not None
        super().__init__(spec.shape, dtype, seed)

    # -- spec-delegated surface ------------------------------------------------

    @property
    def spec(self) -> GridSpec:
        """The underlying functional spec (jit-safe ``sample(key)`` lives there)."""
        return self._spec

    @property
    def values(self) -> np.ndarray:
        return np.asarray(self._spec.values, dtype=self.dtype)

    @property
    def n(self) -> int:
        return self._spec.n

    @property
    def probs(self) -> np.ndarray:
        return np.asarray(self._spec.probs)

    @property
    def size(self) -> int:
        return self._spec.size

    def contains(self, x) -> bool:
        # No dtype cast here: coercing 0.5 -> 0 (or wrapping 259 -> 3 at
        # int8) would silently accept invalid grids.  Per the gym contract,
        # un-arrayable input means "not contained", never an exception.
        try:
            return self._spec.contains(np.asarray(x))
        except (TypeError, ValueError):
            return False

    # -- gymnasium-stateful surface --------------------------------------------

    def sample(self) -> np.ndarray:
        flat = self.np_random.choice(self.values, size=self.size, p=self.probs)
        return flat.reshape(self.shape)

    def __eq__(self, other):
        if not isinstance(other, GridSpace):
            return False
        return self.shape == other.shape and np.array_equal(
            self.values, other.values
        )

    def __repr__(self):
        inner = (
            f"values={list(self._spec.values)}"
            if self._named_by_values
            else f"n={self.n}"
        )
        return f"GridSpace({inner}, shape={self.shape})"

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
