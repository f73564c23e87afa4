"""Tracing / profiling / frame-time metrics.

The reference's only observability is wall-clock timing around TrackMonocular
with a sorted median/mean printout (reference
Examples/Monocular/mono_marker.cc:247-264, 279-287) plus per-stage couts;
vendored-but-unused helpers (aruco timers.h, g2o batch_stats) are never
enabled (SURVEY.md §5 'Tracing / profiling'). Here the frame-time histogram
is a first-class metric object and device-side profiling is one context
manager around XLA's tracer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class FrameTimer:
    """Wall-clock per-frame latency accumulator with percentile/histogram
    reporting — the reference's median/mean printout, kept as an API.

    Usage:
        timer = FrameTimer(warmup=5)
        with timer.frame():
            slam.track_monocular(img, ts)
        print(timer.report())
    """

    def __init__(self, warmup: int = 0):
        self.warmup = warmup
        self.times_s: List[float] = []

    @contextlib.contextmanager
    def frame(self, n: int = 1):
        """Time one unit of work covering `n` frames (n>1 for chunked
        dispatches à la track_monocular_batch)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) / max(n, 1)
            self.times_s.extend([dt] * n)

    def _ms(self) -> np.ndarray:
        arr = np.asarray(self.times_s[self.warmup:], dtype=np.float64)
        return arr * 1e3

    def percentile(self, q: float) -> float:
        ms = self._ms()
        return float(np.percentile(ms, q)) if ms.size else float("nan")

    def histogram(self, bins: int = 20) -> Dict[str, np.ndarray]:
        ms = self._ms()
        if not ms.size:
            return {"edges_ms": np.zeros(1), "counts": np.zeros(0, int)}
        counts, edges = np.histogram(ms, bins=bins)
        return {"edges_ms": edges, "counts": counts}

    def report(self) -> Dict[str, float]:
        ms = self._ms()
        if not ms.size:
            return {"frames": 0}
        return {
            "frames": int(ms.size),
            "median_ms": float(np.median(ms)),
            "mean_ms": float(np.mean(ms)),
            "p90_ms": float(np.percentile(ms, 90)),
            "p99_ms": float(np.percentile(ms, 99)),
            "fps": float(1e3 / np.mean(ms)),
        }

    def __str__(self):
        r = self.report()
        if not r.get("frames"):
            return "FrameTimer(empty)"
        return (
            f"median tracking time: {r['median_ms']:.1f} ms | "
            f"mean: {r['mean_ms']:.1f} ms | p90: {r['p90_ms']:.1f} ms | "
            f"{r['fps']:.1f} fps over {r['frames']} frames"
        )


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace (device + host timeline,
    viewable in TensorBoard / Perfetto). No-op when log_dir is None, so call
    sites can thread a CLI flag straight through."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named host-side region inside a device_trace timeline
    (jax.profiler.TraceAnnotation); no-op-cheap when not tracing."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
