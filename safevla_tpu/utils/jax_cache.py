"""Persistent XLA compilation cache.

First compiles of the full training step take minutes (remote AOT on the
bench chip); the persistent cache makes every later process start warm.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str = "") -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SAFEVLA_JAX_CACHE", os.path.expanduser("~/.cache/safevla_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
