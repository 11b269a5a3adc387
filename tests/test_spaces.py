"""Space-law tests (counterpart of reference tests/test_grid_space.py:9-71)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.core.gym_compat import GridSpace
from gymca_tpu.core.spaces import (
    BoxSpec,
    DictSpec,
    DiscreteSpec,
    GridSpec,
    MultiDiscreteSpec,
    TupleSpec,
)


class TestGridSpec:
    def test_contains_its_samples(self, key):
        spec = GridSpec(values=(0, 3, 25), shape=(8, 8))
        for i in range(8):
            sample = spec.sample(jax.random.fold_in(key, i))
            assert spec.contains(np.asarray(sample))

    def test_key_determinism(self, key):
        spec = GridSpec(n=4, shape=(6, 6))
        a = spec.sample(key)
        b = spec.sample(key)
        assert jnp.array_equal(a, b)

    def test_probs_respected(self, key):
        spec = GridSpec(values=(0, 1, 2), probs=(0.0, 1.0, 0.0), shape=(16, 16))
        sample = spec.sample(key)
        assert bool(jnp.all(sample == 1))

    def test_jit_samplable(self, key):
        spec = GridSpec(n=3, shape=(4, 4))
        sample = jax.jit(spec.sample)(key)
        assert sample.shape == (4, 4)

    def test_values_or_n_required(self):
        with pytest.raises(ValueError):
            GridSpec(shape=(2, 2))

    def test_equality_and_hash(self):
        a = GridSpec(values=(0, 1, 2), shape=(2, 2))
        b = GridSpec(n=3, shape=(2, 2))
        assert a == b
        assert hash(a) == hash(b)


class TestGymGridSpace:
    def test_contains_its_samples(self):
        space = GridSpace(values=[0, 3, 25], shape=(5, 5), seed=7)
        for _ in range(8):
            assert space.contains(space.sample())

    def test_seed_determinism(self):
        for seed in range(4):
            a = GridSpace(n=3, shape=(4, 4), seed=seed)
            b = GridSpace(n=3, shape=(4, 4), seed=seed)
            assert np.array_equal(a.sample(), b.sample())

    def test_equality(self):
        assert GridSpace(n=3, shape=(2, 2)) == GridSpace(values=[0, 1, 2], shape=(2, 2))
        assert GridSpace(n=3, shape=(2, 2)) != GridSpace(n=4, shape=(2, 2))

    def test_flatten(self):
        from gymnasium.spaces import flatten

        space = GridSpace(n=3, shape=(2, 2), seed=0)
        x = space.sample()
        assert flatten(space, x).shape == (4,)


class TestOtherSpecs:
    def test_box(self, key):
        spec = BoxSpec(0.0, 1.0, shape=(3, 3))
        s = spec.sample(key)
        assert spec.contains(np.asarray(s))

    def test_discrete(self, key):
        spec = DiscreteSpec(9)
        assert spec.contains(int(spec.sample(key)))

    def test_multidiscrete(self, key):
        spec = MultiDiscreteSpec((9, 2))
        s = np.asarray(spec.sample(key))
        assert spec.contains(s)
        assert s.shape == (2,)

    def test_tuple_dict(self, key):
        spec = TupleSpec((DiscreteSpec(3), BoxSpec(0, 1, shape=(2,))))
        assert spec.contains(jax.tree.map(np.asarray, spec.sample(key)))
        d = DictSpec.of(a=DiscreteSpec(2), b=BoxSpec(0, 1, shape=()))
        assert d.contains(jax.tree.map(np.asarray, d.sample(key)))

    def test_box_unbounded_high_sample_law(self, key):
        """Unbounded-above Box: samples stay in the space AND the sampler's
        support is unbounded (regression: it used to clamp high=inf to 1.0,
        so the Bulldozer time space contained values it could never sample)."""
        spec = BoxSpec(0.0, float("inf"), shape=(64,))
        s = np.asarray(spec.sample(key))
        assert spec.contains(s)
        # Exp(1) over 64 draws exceeds 1.0 with probability 1 - (1-e^-1)^64
        assert float(s.max()) > 1.0

    def test_discrete_contains_arrays_no_crash(self, key):
        spec = DiscreteSpec(9)
        assert spec.contains(np.asarray(3))           # 0-d array
        assert not spec.contains(np.asarray([1, 2]))  # vector is outside
        assert not spec.contains(np.asarray(9))
        assert not spec.contains(np.asarray(-1))
        assert not spec.contains(np.asarray(2.5))     # non-integral
        assert spec.contains(np.asarray(2.0))         # integral float ok

    def test_gymnasium_conversion(self):
        spec = TupleSpec(
            (
                GridSpec(n=3, shape=(4, 4)),
                TupleSpec((BoxSpec(0, 1, shape=(2,)), MultiDiscreteSpec((4, 4)))),
            )
        )
        gym_space = spec.to_gymnasium()
        assert gym_space is not None
