"""CI guard for the north-star repro protocol (VERDICT round-4 item 2):
the exact scripts a data-equipped environment would run for the 55.8
ImageNet-LT / 26.3 LVIS reproductions execute end-to-end here in their
IIF_SMOKE mode (synthetic stand-in data, same invocations), so the
pinned hyperparameter mapping in docs/repro.md cannot rot."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _smoke_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["IIF_SMOKE"] = "1"
    return env


@pytest.mark.slow
def test_repro_imagenet_lt_smoke(tmp_path):
    r = subprocess.run(
        ["bash", "scripts/repro_imagenet_lt.sh", str(tmp_path / "out")],
        capture_output=True, text=True, env=_smoke_env(), timeout=2400,
        cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "IIF_SMOKE repro_imagenet_lt: OK" in r.stdout


@pytest.mark.slow
def test_repro_lvis_iif_smoke(tmp_path):
    r = subprocess.run(
        ["bash", "scripts/repro_lvis_iif.sh", str(tmp_path / "out")],
        capture_output=True, text=True, env=_smoke_env(), timeout=2400,
        cwd=REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "AP" in r.stdout
