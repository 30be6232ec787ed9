"""Test configuration: force CPU backend with 8 virtual devices so every
mesh/parallelism test runs without TPU hardware (the strategy SURVEY.md §4
recommends in place of the reference's torchrun multi-GPU unit tests)."""
import os

# must happen before jax is imported anywhere
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
# the environment's sitecustomize force-registers a TPU plugin regardless of
# JAX_PLATFORMS; override at the config level too.
jax.config.update("jax_platforms", "cpu")
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
