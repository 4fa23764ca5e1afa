"""Persistent XLA compilation cache.

Compiles through the axon tunnel take 30-120 s per graph; the persistent
cache makes re-runs (bench, resumed training, repeated CLI invocations)
skip recompilation of unchanged graphs.  Opt out with
``MUSICGAN_NO_COMPILE_CACHE=1`` or point ``MUSICGAN_COMPILE_CACHE`` at a
different directory.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "musicgan_tpu", "xla"
)


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the persistent cache — TPU/accelerator platforms only.

    On CPU this is a no-op unless a path is forced (arg or
    ``MUSICGAN_COMPILE_CACHE``): XLA:CPU executable (de)serialization
    segfaulted two suite runs (once loading an AOT entry whose machine
    features didn't match the host — the loader itself warns "could
    lead to execution errors such as SIGILL" — and once serializing
    into a fresh cache).  CPU compiles are seconds; tunnel-remote TPU
    compiles are minutes and their cache entries have never
    miscompared, so the trade only makes sense there.
    """
    if os.environ.get("MUSICGAN_NO_COMPILE_CACHE"):
        return None
    forced = path or os.environ.get("MUSICGAN_COMPILE_CACHE")
    # primary platform only: the axon plugin registers as "axon,cpu"
    # (cpu as fallback), which must still get the cache.  When no
    # platform was configured at all (plain CPU host, no JAX_PLATFORMS),
    # ask the backend — otherwise the guard would fail open.
    primary = (jax.config.jax_platforms or "").split(",")[0].strip()
    if not primary:
        primary = jax.default_backend()
    if primary == "cpu" and not forced:
        return None
    path = forced or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
