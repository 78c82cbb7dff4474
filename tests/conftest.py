"""Test configuration: CPU backend with 8 virtual devices + float64.

Mirrors the reference's quick/extended tiers (``test/runtests.jl:8-19``) via
pytest markers, and adds what the reference lacks: multi-device sharding
tests on a fake CPU mesh (``--xla_force_host_platform_device_count``, the
standard JAX trick — see SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin force-registers itself via sitecustomize and overrides
# JAX_PLATFORMS; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "extended: long-running statistical tests")
