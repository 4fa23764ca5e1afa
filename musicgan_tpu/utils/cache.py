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
    if os.environ.get("MUSICGAN_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get("MUSICGAN_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
