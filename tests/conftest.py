import os

# Unit tests run on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware (the reference's device fixture analogue,
# `tests/conftest.py:19-30`, enumerated cpu+cuda instead).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    import jax

    return jax.devices()
