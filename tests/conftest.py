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
    config.addinivalue_line(
        "markers", "e2e: subprocess CLI end-to-end test")
    config.addinivalue_line(
        "markers", "overfit: per-family learning/overfit test "
        "(minutes each on the CPU mesh)")
    config.addinivalue_line(
        "markers", "fast: unit-tier test (the <10-min smoke tier; "
        "run with `pytest -m fast`)")


# Test tiers (VERDICT round-4 item 7). Tests are auto-marked:
#   e2e     — subprocess CLI modules
#   overfit — learning-check tests (name-matched) and slow node ids
#             listed in tests/slow_tests.txt
#   fast    — the <10-min smoke tier: a CURATED module allowlist of
#             pure-math / oracle-differential / data / config tests
#             (no model-training loops, no multi-minute jit compiles).
#             Everything outside the allowlist is the default (unmarked)
#             per-family tier, run by a plain `pytest tests/`.
_E2E_MODULES = {"test_detection_e2e", "test_repro_scripts"}
_OVERFIT_NAME_RE = ("overfit", "learns", "learning", "converge")
# Modules that complete in seconds each on the 1-core 8-device CPU mesh
_FAST_MODULES = {
    "test_iif_loss", "test_losses", "test_losses_extra", "test_ops",
    "test_geometry_oracle", "test_detection_data", "test_data",
    "test_configs", "test_core", "test_fasa", "test_yolox_schedule",
    "test_eval_native", "test_native_rle", "test_mask_structures",
    "test_samplers_extra", "test_augment", "test_local_bn",
    "test_eval_parity", "test_panoptic_eval",
}


def _load_slow_ids():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return {ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")}


def pytest_collection_modifyitems(config, items):
    slow_ids = _load_slow_ids()
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        mod = mod[:-3] if mod.endswith(".py") else mod
        rel = f"{mod}.py::" + item.nodeid.split("::", 1)[-1]
        tiered = False
        if mod in _E2E_MODULES or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.e2e)
            tiered = True
        name = item.name.lower()
        if (any(k in name for k in _OVERFIT_NAME_RE)
                or rel in slow_ids or item.nodeid in slow_ids):
            item.add_marker(pytest.mark.overfit)
            tiered = True
        if not tiered and mod in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
