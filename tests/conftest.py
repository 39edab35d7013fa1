"""Test configuration: force JAX onto CPU with 8 virtual devices so mesh /
sharding tests run without TPU hardware (SURVEY.md §4 test strategy).

NOTE: this environment's sitecustomize registers the remote-TPU ("axon")
PJRT plugin at interpreter start and force-sets jax_platforms="axon,cpu",
overriding the JAX_PLATFORMS env var. Backend *initialization* is lazy, so
resetting the config here (before any jax op runs) pins tests to CPU —
otherwise every test compiles over the remote-TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + str(jax.devices()))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns etc.)")
