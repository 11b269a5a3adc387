"""Environment registration and public catalog.

Counterpart of reference ``gym_cellular_automata/registration.py:19-62``:
``REGISTERED_CA_ENVS`` (gym.make ids), ``prototypes`` (raw classes),
``_register_caenvs()``.
"""

from __future__ import annotations

LIBRARY = "gymca_tpu"

HELR, HELC = 42, 42
BULR, BULC = 256, 256

REGISTERED_CA_ENVS = {
    f"ForestFireHelicopter{HELR}x{HELC}-v1": {
        "kwargs": {"nrows": HELR, "ncols": HELC},
        "entry_point": "gymca_tpu.envs.helicopter:ForestFireHelicopterEnv",
    },
    f"ForestFireBulldozer{BULR}x{BULC}-v3": {
        "kwargs": {"nrows": BULR, "ncols": BULC},
        "entry_point": "gymca_tpu.envs.bulldozer:ForestFireBulldozerEnv",
    },
}

GYM_MAKE = tuple(LIBRARY + ":" + ca_env for ca_env in REGISTERED_CA_ENVS)


def get_prototypes():
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
    from gymca_tpu.envs.bulldozer import ForestFireBulldozerEnv
    from gymca_tpu.envs.helicopter import ForestFireHelicopterEnv

    return (
        ForestFireHelicopterEnv,
        ForestFireBulldozerEnv,
        AdvancedForestFireBulldozerEnv,
    )


def _register_caenvs():
    from gymnasium.envs.registration import register
    from gymnasium.error import Error as GymError

    for ca_env, cfg in REGISTERED_CA_ENVS.items():
        try:
            register(ca_env, kwargs=cfg["kwargs"], entry_point=cfg["entry_point"])
        except GymError:  # already registered (e.g. double import)
            pass
