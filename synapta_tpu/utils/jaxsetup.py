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
    # CPU-backend entries are AOT-compiled for the machine that wrote
    # them; loading them on a host with different CPU features risks
    # SIGILL (and warns loudly). Key the CPU cache by a host fingerprint
    # so cross-machine entries are never loaded. TPU entries are
    # device-keyed by XLA already and stay shared.
    #
    # Known cosmetic residue: on CPU models where XLA derives the
    # +prefer-no-gather/+prefer-no-scatter scheduling pseudo-features,
    # cpu_aot_loader warns on EVERY load — including entries this same
    # machine just wrote (verified: fresh cache, write then reload in
    # consecutive processes on one host). The loader compares compile
    # features against llvm's host query, which never reports those
    # pseudo-features. XLA 0.9 exposes no flag to relax the check; the
    # entries are genuinely same-machine and safe. The driver-facing
    # dryrun runs compilation-cache-free, so its signal stays clean.
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats.startswith("cpu"):
        import hashlib

        # Key on model identity AND the flags line: XLA derives scheduling
        # pseudo-features (+prefer-no-gather/scatter) from the CPU MODEL,
        # so two hosts with identical cpuinfo flags but different models
        # produce incompatible AOT entries (observed: cache entries from a
        # flags-identical sibling host loading with SIGILL-risk warnings).
        try:
            with open("/proc/cpuinfo") as f:
                keep = ("flags", "model", "cpu family", "stepping",
                        "vendor_id")
                lines = []
                for ln in f:
                    if ln.startswith(keep):
                        lines.append(ln)
                    if ln.strip() == "":
                        break  # first processor block is enough
                flags = "".join(lines) or "unknown"
        except OSError:
            flags = "unknown"
        fp = hashlib.sha256(flags.encode()).hexdigest()[:12]
        cache_dir = os.path.join(cache_dir, f"cpu-{fp}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization, never fatal
