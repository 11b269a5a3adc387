"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on a fake mesh via
``--xla_force_host_platform_device_count=8`` (no TPU pod needed), per the
project test strategy (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env vars)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(42)
