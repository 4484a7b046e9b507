"""Runtime-environment collection — the analog of the reference's
``mmdet/utils/collect_env.py`` (which logs an ``env_info`` block at the
top of every training log / ``.log.json``; see the env_info block in
``experiments/iif/iif_r50_4x4_1x/20220825_181618.log.json``).

The reference reports torch/CUDA/NCCL/mmcv versions; the TPU-native
equivalents are jax/jaxlib/libtpu, the platform backend, and the device
inventory. Usable as a module: ``python -m iif_tpu.utils.env``.
"""
from __future__ import annotations

import platform
import subprocess
import sys
from typing import Dict


def _pkg_version(name: str) -> str:
    try:
        import importlib.metadata as md

        return md.version(name)
    except Exception:
        return "n/a"


def _git_hash(short: int = 7) -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5, cwd=__file__.rsplit("/", 3)[0])
        return out.stdout.strip()[:short] or "unknown"
    except Exception:
        return "unknown"


def collect_env() -> Dict[str, str]:
    """Ordered env-info dict (``collect_env.py:8-13`` equivalent)."""
    import jax

    info: Dict[str, str] = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "CPU": platform.processor() or platform.machine(),
        "jax": jax.__version__,
        "jaxlib": _pkg_version("jaxlib"),
        "libtpu": _pkg_version("libtpu"),
        "flax": _pkg_version("flax"),
        "optax": _pkg_version("optax"),
        "orbax-checkpoint": _pkg_version("orbax-checkpoint"),
        "numpy": _pkg_version("numpy"),
        "iif_tpu": "0.3+" + _git_hash(),
    }
    # Device inventory mirrors the reference's GPU 0,1,2,3 lines. Guarded:
    # backend init can fail on a machine with no accelerator configured.
    try:
        devs = jax.devices()
        info["JAX backend"] = jax.default_backend()
        info["Devices"] = f"{len(devs)}x {devs[0].device_kind}"
        info["Process count"] = str(jax.process_count())
    except Exception as exc:  # pragma: no cover
        info["JAX backend"] = f"unavailable ({type(exc).__name__})"
    return info


def env_info_str() -> str:
    """One-line-per-field block, same rendering the reference logs."""
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())


if __name__ == "__main__":
    print(env_info_str())
