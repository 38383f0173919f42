"""Persistent XLA/Mosaic compilation cache.

Every CLI entry point calls :func:`enable_compilation_cache` before
building a model. The fused Pallas kernel set costs ~8-10 min of Mosaic
compiles cold, and the unrolled pyramid models (CVSR_V7 / SIDECVSR) cost
minutes of XLA compile per geometry; with the cache enabled each
(program, geometry) pair compiles once per machine and is a disk hit on
every later run. The reference has no analog (PyTorch eager rebuilds
nothing), so this is pure TPU-side ergonomics, not a protocol deviation:
compile time is outside the timing boundary either way
(`test_LD_22_FPS.py:183-197` times only the forward).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/jax_cdfo"


def apply_platform_env() -> None:
    """Make the ``JAX_PLATFORMS`` env var effective on this deployment.

    The axon TPU plugin's sitecustomize force-registers the TPU backend
    regardless of ``JAX_PLATFORMS``, so a caller (e.g. the test suite
    launching a CLI subprocess with ``JAX_PLATFORMS=cpu``) silently ends
    up on — and queues behind — the real chip. Re-applying the env var
    through ``jax.config`` restores the standard semantics. No-op when
    the var is unset.
    """
    import jax

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:  # pragma: no cover - backend already up
            import warnings
            warnings.warn(
                f"JAX_PLATFORMS={plat!r} could not be applied "
                f"({type(e).__name__}: {e}); this process may run on a "
                "different backend than requested", stacklevel=2)


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 5.0) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the cache directory, or None when the running JAX does not
    support the cache config (older versions / exotic backends) — callers
    proceed with cold compiles in that case.
    """
    import jax

    cache = os.path.expanduser(cache_dir or
                               os.environ.get("CDFO_JAX_CACHE", _DEFAULT_DIR))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        return None
    return cache
