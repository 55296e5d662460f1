"""Profiling / tracing hooks (SURVEY §5).

The reference's only tracing is wall-clock logging in MetricLogger
(maskrcnn_benchmark/utils/metric_logger.py:11-93) plus a per-run s/img line
(engine/inference.py:741-747). The TPU build adds first-class hooks:

  * `trace(logdir)` — context manager around `jax.profiler` producing an
    XPlane/TensorBoard trace of device + host activity;
  * `annotate(name)` — a TraceAnnotation so named regions show up inside the
    device trace (works under jit via named_scope for compiled regions);
  * `StepTimer` — dispatch-aware wall-clock timing with a device fence
    (block_until_ready on a probe output), the mechanism behind bench.py's
    images/sec metric.

All helpers degrade to no-ops when profiling is unavailable (e.g. some
remote-plugin runtimes), so call sites never need guards.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace into `logdir` (TensorBoard-viewable)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir, create_perfetto_link=False)
        started = True
    except Exception:
        pass  # remote runtimes without profiler support
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str):
    """Name a region in the profiler timeline (host) and HLO (device)."""
    import jax

    try:
        with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
            yield
    except Exception:
        yield


def device_fence(tree: Any) -> None:
    """Block until every array in `tree` is computed on device."""
    import jax

    jax.block_until_ready(tree)


class StepTimer:
    """Wall-clock step timing with device fences and a warmup skip.

    Usage:
        timer = StepTimer(warmup=2)
        for batch in data:
            out = step(batch)
            timer.tick(out)          # fences on `out`
        stats = timer.summary()      # {"steps", "mean_s", "p50_s", "rate"}
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._seen = 0
        self._t_last: Optional[float] = None
        self.durations: List[float] = []

    def tick(self, probe: Any = None) -> Optional[float]:
        if probe is not None:
            device_fence(probe)
        now = time.perf_counter()
        dt = None
        if self._t_last is not None:
            self._seen += 1
            if self._seen > self.warmup:
                dt = now - self._t_last
                self.durations.append(dt)
        self._t_last = now
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {"steps": 0, "mean_s": 0.0, "p50_s": 0.0, "rate": 0.0}
        d = sorted(self.durations)
        n = len(d)
        mean = sum(d) / n
        return {
            "steps": n,
            "mean_s": mean,
            "p50_s": d[n // 2],
            "rate": (1.0 / mean) if mean > 0 else 0.0,
        }
