"""Placeholder — AdvancedForestFireBulldozerEnv lands in the next milestone."""


class AdvancedForestFireBulldozerEnv:  # pragma: no cover - stub
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("AdvancedForestFireBulldozerEnv: in progress")
