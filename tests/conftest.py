"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run on a fake mesh via
``--xla_force_host_platform_device_count=8`` (no TPU pod needed), per the
project test strategy (SURVEY.md §4).
"""

import os

# NOTE: this box's sitecustomize imports jax at interpreter startup, so
# setting JAX_PLATFORMS via os.environ here is too late.  XLA_FLAGS is still
# read lazily (at first backend init), and jax.config works after import.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Opt-in harness knobs mirroring the reference's pytest-randomly /
    pytest-repeat plugins (not in this image — SURVEY §4):

    * ``GYMCA_TEST_SHUFFLE=<seed>`` randomizes test order reproducibly,
      exposing hidden inter-test state.
    * ``GYMCA_TEST_REPEAT=<k>`` runs every collected test k times,
      exposing flakes.
    """
    seed = os.environ.get("GYMCA_TEST_SHUFFLE")
    if seed:
        import random

        random.Random(int(seed)).shuffle(items)
    rep = int(os.environ.get("GYMCA_TEST_REPEAT", "1"))
    if rep > 1:
        items[:] = [it for it in items for _ in range(rep)]


@pytest.fixture
def key():
    return jax.random.key(42)
