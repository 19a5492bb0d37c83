"""Persistent XLA compilation cache wiring (utils/xla_cache.py)."""

import os

from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache


def test_cache_off(monkeypatch):
    monkeypatch.setenv("GSAVATAR_XLA_CACHE", "off")
    assert enable_compilation_cache() is None


def test_cache_custom_dir(tmp_path, monkeypatch):
    d = os.path.join(tmp_path, "xla")
    monkeypatch.setenv("GSAVATAR_XLA_CACHE", d)
    import jax

    assert enable_compilation_cache() == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
