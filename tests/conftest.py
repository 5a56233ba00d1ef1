import os

# Unit tests run on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware (the reference's device fixture analogue,
# `tests/conftest.py:19-30`, enumerated cpu+cuda instead).
#
# The ambient environment routes jax at a tunneled TPU ("axon") and its
# sitecustomize force-updates jax_platforms at interpreter start, so the env
# var alone is not enough: re-update the config before any backend
# initializes. Running tests over the tunnel makes every eager op a network
# round-trip (~20x slower) and breaks when another process holds the chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
