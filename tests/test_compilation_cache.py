"""Persistent-compilation-cache helper (frido_tpu/utils/compilation_cache)."""

import pytest

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

import os

import jax

from frido_tpu.utils.compilation_cache import enable


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("FRIDO_COMPILATION_CACHE", raising=False)
    d = str(tmp_path / "xla-cache")
    assert enable(d) is True
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d

    # a jitted call populates the cache on backends that can serialize
    # executables (CPU can); entries appear as files under the dir
    jax.jit(lambda x: x * 2 + 1)(jax.numpy.arange(8.0)).block_until_ready()
    # no assertion on file count: the CPU backend may defer writes, and
    # the API contract here is only "configured + harmless"


def test_enable_respects_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("FRIDO_COMPILATION_CACHE", "0")
    assert enable(str(tmp_path / "nope")) is False
    assert not os.path.exists(str(tmp_path / "nope"))
