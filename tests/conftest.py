"""Test configuration: force an 8-device CPU mesh so sharding logic is
exercised without TPU hardware.

NOTE: setting JAX_PLATFORMS in the environment is NOT sufficient here — the
host image's sitecustomize registers a remote-TPU (axon) PJRT plugin at
interpreter start and pins the platform selection. ``jax.config.update``
after import reliably overrides it back to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
