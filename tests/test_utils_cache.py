"""enable_compilation_cache: sets the JAX persistent-cache config.

All CLI entry points call this before building a model (the fused kernel
set and the unrolled pyramid models cost minutes of cold compile; the
cache makes each (program, geometry) pair a one-time cost per machine).
"""
import os

import jax

from cdfo_tpu.utils import enable_compilation_cache


def test_sets_cache_dir(tmp_path):
    target = str(tmp_path / "jaxcache")
    out = enable_compilation_cache(target)
    assert out == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_apply_platform_env(monkeypatch):
    # conftest pins this suite to cpu; the helper must re-apply the env
    # var (the axon sitecustomize ignores it), here a no-op round-trip
    from cdfo_tpu.utils import apply_platform_env
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    apply_platform_env()
    assert jax.config.jax_platforms == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_env_override(tmp_path, monkeypatch):
    target = str(tmp_path / "envcache")
    monkeypatch.setenv("CDFO_JAX_CACHE", target)
    assert enable_compilation_cache() == target
    assert jax.config.jax_compilation_cache_dir == target
