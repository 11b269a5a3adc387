"""gymca_tpu — TPU-native cellular-automata RL environment suite.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``gym_cellular_automata`` (reference ``__init__.py:31-51``): Gymnasium-style
CA environments where an agent drives the emergent properties of a CA grid,
plus a PPO trainer, built TPU-first:

* one pure-functional stack (state pytrees, explicit PRNG keys) serving both
  the single-env debug path and the vmapped / mesh-sharded production path;
* CA rules as fused stencil programs (shifted-mask XLA + Pallas TPU kernels);
* scaling via ``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives.
"""

from types import SimpleNamespace

from gymca_tpu.core.env import CAEnvCore, EnvState, GymCAEnv, StepOutput, autoreset_step
from gymca_tpu.core.gym_compat import GridSpace
from gymca_tpu.core.operator import Identity, Operator
from gymca_tpu.core.spaces import (
    BoxSpec,
    DictSpec,
    DiscreteSpec,
    GridSpec,
    MultiDiscreteSpec,
    TupleSpec,
)
from gymca_tpu.registration import (
    GYM_MAKE,
    REGISTERED_CA_ENVS,
    _register_caenvs,
    get_prototypes,
)
from gymca_tpu.version import VERSION as __version__

RELEASE = False

_register_caenvs()

# Public catalog, mirroring the reference's `gymca` namespace
# (reference __init__.py:33-48).
gymca = SimpleNamespace(
    envs=GYM_MAKE,
    prototypes=get_prototypes(),
)

__all__ = [
    "CAEnvCore",
    "EnvState",
    "StepOutput",
    "GymCAEnv",
    "autoreset_step",
    "Operator",
    "Identity",
    "GridSpace",
    "GridSpec",
    "BoxSpec",
    "DiscreteSpec",
    "MultiDiscreteSpec",
    "TupleSpec",
    "DictSpec",
    "gymca",
    "REGISTERED_CA_ENVS",
    "GYM_MAKE",
]
