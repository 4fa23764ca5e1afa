"""Persistent-compilation-cache policy (musicgan_tpu/utils/cache.py).

The cache is for accelerator platforms only: XLA:CPU executable
(de)serialization segfaulted suite runs (see conftest.py), so on a
CPU-primary process ``enable_compilation_cache`` must be a no-op unless
a path is explicitly forced.  The suite itself runs CPU-primary
(conftest), which is exactly the configuration under test.
"""

import os

import jax


def test_cache_noop_on_cpu_primary(tmp_path, monkeypatch):
    monkeypatch.delenv("MUSICGAN_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("MUSICGAN_NO_COMPILE_CACHE", raising=False)
    from musicgan_tpu.utils.cache import enable_compilation_cache

    assert jax.config.jax_platforms.split(",")[0].strip() == "cpu"
    before = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_cache_enabled_when_forced(tmp_path, monkeypatch):
    monkeypatch.delenv("MUSICGAN_NO_COMPILE_CACHE", raising=False)
    from musicgan_tpu.utils.cache import enable_compilation_cache

    target = str(tmp_path / "xla")
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compilation_cache(target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # env-var forcing works the same way
        env_target = str(tmp_path / "xla_env")
        monkeypatch.setenv("MUSICGAN_COMPILE_CACHE", env_target)
        assert enable_compilation_cache() == env_target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_global_optout_wins(tmp_path, monkeypatch):
    from musicgan_tpu.utils.cache import enable_compilation_cache

    monkeypatch.setenv("MUSICGAN_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "x")) is None
