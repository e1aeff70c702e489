"""Persistent XLA compilation cache (utils/platform.enable_compile_cache):
opt-in via CLI flag or SSD_COMPILE_CACHE, populated on first compile."""

import jax
import jax.numpy as jnp
import pytest

from ssd_tpu.utils.platform import enable_compile_cache


@pytest.fixture
def restore_cache_config():
    orig_dir = jax.config.jax_compilation_cache_dir
    orig_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", orig_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", orig_min)


def test_disabled_without_arg_or_env(monkeypatch):
    monkeypatch.delenv("SSD_COMPILE_CACHE", raising=False)
    assert enable_compile_cache(None) is None


def test_env_var_default(monkeypatch, tmp_path, restore_cache_config):
    monkeypatch.setenv("SSD_COMPILE_CACHE", str(tmp_path / "envcache"))
    path = enable_compile_cache(None)
    assert path == str(tmp_path / "envcache")
    assert (tmp_path / "envcache").is_dir()


def test_cache_populates_on_compile(tmp_path, restore_cache_config):
    cache = tmp_path / "cache"
    assert enable_compile_cache(str(cache)) == str(cache)

    @jax.jit
    def f(x):
        return x * 3.14159 + 2.71828  # unique constants → fresh cache key

    f(jnp.arange(64.0)).block_until_ready()
    entries = [p for p in cache.rglob("*") if p.is_file()]
    assert entries, "compilation cache dir is empty after a jit compile"
