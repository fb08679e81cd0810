"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), the standard way to validate
shard_map layouts without real TPU hardware.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sample_scene_path():
    return "/root/reference/sample_scene.rtvs"
