"""Drop-in import compatibility with ``gym_cellular_automata``.

Reference users can switch with one line:

    import gymca_tpu.compat as gym_cellular_automata

and find the reference's public names (``__init__.py:31-51``): ``gymca``
(with ``.envs`` / ``.prototypes``), ``CAEnv``, ``GridSpace``, ``Operator``,
``RELEASE``, ``__version__``, plus ``forest_fire``-style operator and env
classes under their reference names.
"""

from __future__ import annotations

from gymca_tpu import GYM_MAKE, REGISTERED_CA_ENVS, RELEASE, __version__, gymca
from gymca_tpu.core.env import GymCAEnv as CAEnv
from gymca_tpu.core.gym_compat import GridSpace
from gymca_tpu.core.operator import Identity, Operator
from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
from gymca_tpu.envs.bulldozer import ForestFireBulldozerEnv
from gymca_tpu.envs.helicopter import ForestFireHelicopterEnv
from gymca_tpu.ops.alexandridis import AlexandridisCA as PartiallyObservableForestFireJax
from gymca_tpu.ops.drossel import ForestFire
from gymca_tpu.ops.move_modify import Modify, Move, MoveModify
from gymca_tpu.ops.repeat_ca import RepeatCA
from gymca_tpu.ops.windy import WindyForestFire

envs = gymca.envs
prototypes = gymca.prototypes

__all__ = [
    "gymca",
    "envs",
    "prototypes",
    "CAEnv",
    "GridSpace",
    "Operator",
    "Identity",
    "RELEASE",
    "__version__",
    "GYM_MAKE",
    "REGISTERED_CA_ENVS",
    "ForestFire",
    "WindyForestFire",
    "PartiallyObservableForestFireJax",
    "Move",
    "Modify",
    "MoveModify",
    "RepeatCA",
    "ForestFireHelicopterEnv",
    "ForestFireBulldozerEnv",
    "AdvancedForestFireBulldozerEnv",
]
