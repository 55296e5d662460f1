"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax initializes a backend — pytest imports conftest first.

MQDET_TEST_TPU=1 keeps the real TPU backend so the `-m tpu` tier
(real-chip Mosaic compile gates) actually reaches hardware — without it
the CPU force would silently run those tests in a mode where pallas_call
raises, which is how the MSDA compile gate went unexercised through
round 3.
"""
import os

_ON_TPU = os.environ.get("MQDET_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# The axon TPU-tunnel plugin (sitecustomize) force-sets jax_platforms at
# interpreter boot, which overrides the env var; undo it for tests.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: full-model tiny-config jits dominate suite time;
# repeat runs hit the cache and skip the cold compile. On this jax build the
# env-var path does not populate the cache on CPU — it must be configured via
# jax.config, and min_entry_size_bytes must be lifted (-1) or CPU
# executables are silently skipped as "too small".
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# This jax build truncates f32 matmul operands to bf16 at DEFAULT precision
# even on CPU (TPU-numerics emulation); parity tests need exact f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def monkeypatch_module():
    """Module-scoped monkeypatch (for module-scoped model fixtures)."""
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()
