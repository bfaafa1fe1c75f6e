"""Unit tests for the opt-out persistent compilation cache helper.

Functional caching through the axon tunnel is verified manually on TPU
(CLAUDE.md); here we pin the config plumbing: dir creation, env override,
and the "off" escape hatch (needed when timing cold compiles).
"""
import os

import jax

from rba_tpu.utils.compile_cache import enable_compile_cache


def test_enable_sets_config_and_creates_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("RBA_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "xla_cache")
    got = enable_compile_cache(target)
    assert got == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # the tunnel RTT dominates, so even fast compiles are worth caching
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0


def test_env_dir_wins_over_default(tmp_path, monkeypatch):
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("RBA_COMPILE_CACHE", target)
    assert enable_compile_cache() == target
    assert os.path.isdir(target)


def test_off_escape_hatch(tmp_path, monkeypatch):
    before = jax.config.jax_compilation_cache_dir
    for off in ("off", "0", ""):
        monkeypatch.setenv("RBA_COMPILE_CACHE", off)
        assert enable_compile_cache(str(tmp_path / "ignored")) is None
    assert jax.config.jax_compilation_cache_dir == before
    assert not os.path.exists(tmp_path / "ignored")
