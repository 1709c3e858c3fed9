"""Profiling: synced step timers and XLA trace capture."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


class StepTimer:
    """Wall-clock timer with device synchronization and summary statistics.

    Replaces eyeballing `time.Now().Sub` (ref: render/rendersystem.go:511 —
    the reference's only timing) with percentile-reporting measurement that
    actually waits for the device.
    """

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.samples.setdefault(name, []).append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.samples.setdefault(name, []).append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(a),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name:<30} n={s['n']:>5} mean={s['mean_ms']:.2f}ms "
                         f"p50={s['p50_ms']:.2f}ms p95={s['p95_ms']:.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
