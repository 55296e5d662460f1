"""Trace-time analytic flop registry for Pallas kernels.

XLA cost analysis cannot see inside `pallas_call` (a custom call), so any
MFU derived from `compiled.cost_analysis()["flops"]` undercounts every model
whose hot ops are Pallas kernels — for the LVIS protocol the Pallas DCN is
~60% of device time (PERF.md) and was invisible. Each Pallas entry point
reports its ALGORITHMIC flops (the math a perfect implementation must do,
not the kernel's internal overcompute) into this registry at trace time;
benchmarks wrap a fresh trace (`jax.make_jaxpr`) in `measure()` and add the
collected total to the XLA-counted flops.

Counts are per trace: an op inside `lax.map`/`lax.scan` is traced once, so
callers multiply by the loop trip count themselves — the same convention
XLA cost analysis uses for the visible ops.
"""
from __future__ import annotations

import contextlib
import threading
from collections import defaultdict
from typing import Dict, Iterator

_state = threading.local()


def add(name: str, flops: float) -> None:
    """Record `flops` for kernel family `name` (no-op outside measure())."""
    acc = getattr(_state, "acc", None)
    if acc is not None:
        acc[name] += float(flops)


class _Measurement:
    def __init__(self, acc: Dict[str, float]):
        self._acc = acc

    def total(self) -> float:
        return float(sum(self._acc.values()))

    def by_kernel(self) -> Dict[str, float]:
        return dict(self._acc)


@contextlib.contextmanager
def measure() -> Iterator[_Measurement]:
    """Collect Pallas flop reports from traces executed inside the block."""
    prev = getattr(_state, "acc", None)
    _state.acc = defaultdict(float)
    try:
        yield _Measurement(_state.acc)
    finally:
        _state.acc = prev
