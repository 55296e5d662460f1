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


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Configure the persistent compile cache. Safe to call more than once;
    call before the first jit compilation (backend init order is fine)."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
