"""Persistent XLA compilation cache.

The LVIS-scale train step takes 3-6 min to compile; the reference's
equivalent cost (CUDA kernel autotuning) is paid once per process too but
its steps are eager. Enabling jax's persistent cache makes every CLI
invocation after the first start in seconds — call ``enable()`` before
the first jit (all iif_tpu CLIs do)."""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Point jax at a persistent compilation cache directory (env
    ``IIF_TPU_CACHE`` > argument > ``~/.cache/iif_tpu_xla``). Safe to call
    multiple times; returns the directory used."""
    import jax

    cache_dir = (os.environ.get("IIF_TPU_CACHE") or cache_dir
                 or os.path.expanduser("~/.cache/iif_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
