"""Lightweight, JAX-native space specs.

TPU-first re-design of the reference's space usage:

* ``GridSpace`` (reference ``gym_cellular_automata/grid_space.py:11-90``) —
  a gymnasium ``Space`` over integer lattices, sampled with NumPy's global
  PCG64.  Here ``GridSpec`` is a frozen, hashable config object whose
  ``sample(key)`` is a pure function of an explicit ``jax.random`` key, so it
  can be called *inside* jit (e.g. for auto-reset re-sampling, which the
  reference cannot do — its initial states freeze at trace time, see
  ``advanced_bulldozer.py:422-518``).

Every spec supports:

* ``sample(key)``      — pure JAX sampling.
* ``contains(x)``      — host-side containment check (tests / validation).
* ``to_gymnasium()``   — conversion for the classic Gym adapter layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gymca_tpu.config import TYPE_BOX, TYPE_INT

__all__ = [
    "Spec",
    "GridSpec",
    "BoxSpec",
    "DiscreteSpec",
    "MultiDiscreteSpec",
    "TupleSpec",
    "DictSpec",
]


class Spec:
    """Base class for all specs (duck-typed; exists for isinstance checks)."""

    def sample(self, key):  # pragma: no cover - abstract
        raise NotImplementedError

    def contains(self, x) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def to_gymnasium(self):  # pragma: no cover - abstract
        raise NotImplementedError


def _freeze(x) -> tuple:
    return tuple(x) if not isinstance(x, tuple) else x


@dataclass(frozen=True)
class GridSpec(Spec):
    """Space of integer cellular-automaton lattices.

    Mirrors the API of the reference ``GridSpace`` (``grid_space.py:23-65``):
    construct from ``n`` or explicit ``values``, optional per-value ``probs``.
    """

    shape: Tuple[int, ...]
    n: Optional[int] = None
    values: Optional[Tuple[int, ...]] = None
    probs: Optional[Tuple[float, ...]] = None
    dtype: Any = TYPE_INT

    def __post_init__(self):
        assert self.shape, "GridSpec needs an explicit lattice shape"
        object.__setattr__(self, "shape", _freeze(self.shape))
        if self.values is not None:
            vals = tuple(int(v) for v in np.unique(np.asarray(self.values)))
            object.__setattr__(self, "values", vals)
            object.__setattr__(self, "n", len(vals))
        elif self.n is not None:
            assert self.n > 0, "cell count 'n' must be >= 1"
            object.__setattr__(self, "values", tuple(range(self.n)))
        else:
            raise ValueError("GridSpec needs either 'n' or 'values'")
        if self.probs is None:
            object.__setattr__(self, "probs", tuple([1.0 / self.n] * self.n))
        else:
            object.__setattr__(self, "probs", tuple(float(p) for p in self.probs))
        assert len(self.values) == len(self.probs), (
            "need exactly one sampling probability per distinct cell value"
        )

    @property
    def size(self) -> int:
        return int(np.prod(self.shape))

    def sample(self, key) -> jnp.ndarray:
        """Pure JAX sample — usable inside jit."""
        values = jnp.asarray(self.values, dtype=self.dtype)
        probs = jnp.asarray(self.probs, dtype=jnp.float32)
        idx = jax.random.choice(key, self.n, shape=self.shape, p=probs)
        return values[idx]

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return (
            set(np.unique(x).tolist()).issubset(set(self.values))
            and tuple(x.shape) == self.shape
        )

    def to_gymnasium(self):
        from gymca_tpu.core.gym_compat import GridSpace

        return GridSpace(values=list(self.values), shape=self.shape,
                         probs=list(self.probs), dtype=np.dtype(self.dtype))

    def __repr__(self):
        return f"GridSpec(values={list(self.values)}, shape={self.shape})"


@dataclass(frozen=True)
class BoxSpec(Spec):
    low: float
    high: float
    shape: Tuple[int, ...] = ()
    dtype: Any = TYPE_BOX

    def __post_init__(self):
        object.__setattr__(self, "shape", _freeze(self.shape))

    def sample(self, key) -> jnp.ndarray:
        if not np.isfinite(self.high):
            # unbounded-above interval: low + Exp(1), matching gymnasium's
            # Box sampling for half-open intervals — every contained value
            # has nonzero density (spec law: support(sample) == space)
            x = self.low + jax.random.exponential(key, self.shape,
                                                  dtype=jnp.float32)
        else:
            x = jax.random.uniform(
                key, self.shape, dtype=jnp.float32, minval=self.low,
                maxval=self.high,
            )
        return x.astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return (
            tuple(x.shape) == self.shape
            and bool(np.all(x >= self.low))
            and bool(np.all(x <= self.high))
        )

    def to_gymnasium(self):
        import gymnasium.spaces as gs

        return gs.Box(self.low, self.high, shape=self.shape, dtype=np.float32)


@dataclass(frozen=True)
class DiscreteSpec(Spec):
    n: int

    def sample(self, key) -> jnp.ndarray:
        return jax.random.randint(key, (), 0, self.n, dtype=TYPE_INT)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        if x.shape != () or not np.issubdtype(x.dtype, np.number):
            return False  # non-scalar / non-numeric input is simply outside
        return bool(x == int(x)) and 0 <= int(x) < self.n

    def to_gymnasium(self):
        import gymnasium.spaces as gs

        return gs.Discrete(self.n)


@dataclass(frozen=True)
class MultiDiscreteSpec(Spec):
    nvec: Tuple[int, ...]

    def __post_init__(self):
        object.__setattr__(self, "nvec", _freeze(self.nvec))

    @property
    def shape(self):
        return (len(self.nvec),)

    def sample(self, key) -> jnp.ndarray:
        keys = jax.random.split(key, len(self.nvec))
        return jnp.stack(
            [jax.random.randint(k, (), 0, n, dtype=TYPE_INT)
             for k, n in zip(keys, self.nvec)]
        )

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == (len(self.nvec),) and bool(
            np.all((x >= 0) & (x < np.asarray(self.nvec)))
        )

    def to_gymnasium(self):
        import gymnasium.spaces as gs

        return gs.MultiDiscrete(np.asarray(self.nvec), dtype=np.int64)


@dataclass(frozen=True)
class TupleSpec(Spec):
    specs: Tuple[Spec, ...]

    def __post_init__(self):
        object.__setattr__(self, "specs", _freeze(self.specs))

    def sample(self, key):
        keys = jax.random.split(key, len(self.specs))
        return tuple(s.sample(k) for s, k in zip(self.specs, keys))

    def contains(self, x) -> bool:
        return len(x) == len(self.specs) and all(
            s.contains(v) for s, v in zip(self.specs, x)
        )

    def to_gymnasium(self):
        import gymnasium.spaces as gs

        return gs.Tuple(tuple(s.to_gymnasium() for s in self.specs))


@dataclass(frozen=True)
class DictSpec(Spec):
    specs: Tuple[Tuple[str, Spec], ...]

    @classmethod
    def of(cls, **specs: Spec) -> "DictSpec":
        return cls(tuple(sorted(specs.items())))

    def __post_init__(self):
        if isinstance(self.specs, dict):
            object.__setattr__(self, "specs", tuple(sorted(self.specs.items())))

    def keys(self):
        return [k for k, _ in self.specs]

    def __getitem__(self, key: str) -> Spec:
        for k, s in self.specs:
            if k == key:
                return s
        raise KeyError(key)

    def sample(self, key):
        keys = jax.random.split(key, max(len(self.specs), 1))
        return {k: s.sample(kk) for (k, s), kk in zip(self.specs, keys)}

    def contains(self, x) -> bool:
        return set(x.keys()) == set(self.keys()) and all(
            s.contains(x[k]) for k, s in self.specs
        )

    def to_gymnasium(self):
        import gymnasium.spaces as gs

        return gs.Dict({k: s.to_gymnasium() for k, s in self.specs})
