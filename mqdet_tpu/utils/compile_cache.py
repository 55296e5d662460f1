"""Persistent XLA compilation cache setup.

MQ-GLIP-T at 800x1344 compiles ~10 min through the axon remote-compile
tunnel; cached runs start in seconds. On this jax build the documented
env-var path (JAX_COMPILATION_CACHE_DIR) silently does NOT populate the
cache — it must be configured via jax.config, and min_entry_size_bytes
must be lifted (-1) or entries are skipped as "too small" (same finding
as tests/conftest.py made for the CPU backend).
"""
from __future__ import annotations

import os


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_compile_cache(path: str | None = None) -> None:
    """Configure the persistent compile cache. Safe to call more than once;
    call before the first jit compilation (backend init order is fine).

    Resolution order: explicit ``path`` arg > user-set
    ``JAX_COMPILATION_CACHE_DIR`` > ``<repo_root>/.jax_cache``. The env var
    alone does not populate the cache on this jax build (see module doc), so
    when set we still route it through jax.config — but we honor its value.
    """
    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            _REPO_ROOT, ".jax_cache"
        )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return  # unwritable location: run without a persistent cache
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
