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

    # The environment's axon sitecustomize force-appends its TPU platform
    # to jax_platforms, overriding JAX_PLATFORMS=cpu; re-assert the user's
    # explicit choice so CPU-forced runs (tests, virtual meshes) stay CPU.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

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
