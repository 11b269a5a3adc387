"""Rendering stubs — full matplotlib rendering added in envs/render milestone."""


def render_helicopter(env):  # pragma: no cover - placeholder
    return None


def render_bulldozer(env):  # pragma: no cover - placeholder
    return None
