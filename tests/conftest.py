"""Test config: emulate an 8-device TPU mesh on CPU.

Must run before jax is imported anywhere — gives every test real
multi-device SPMD semantics (the thing the reference's mocked
distributed tests never exercise, SURVEY.md §4).
"""
import os

# The runtime may pre-import jax (sitecustomize) with a TPU backend, so env
# vars alone are too late; jax.config.update before the first backend init
# still works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh():
    from iif_tpu.parallel import make_mesh

    return make_mesh()


@pytest.fixture(scope="session")
def single_mesh():
    from iif_tpu.parallel import make_mesh

    return make_mesh(devices=jax.devices()[:1])


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test")
