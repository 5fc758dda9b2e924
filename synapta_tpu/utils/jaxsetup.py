"""JAX runtime setup: persistent compilation cache + profiler hooks.

Import-and-call once at process start (pipeline, CLI, tests, bench) so
repeated runs never repay XLA compile time.
"""
from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SYNAPTA_JAX_CACHE", os.path.expanduser("~/.cache/synapta_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never fatal
