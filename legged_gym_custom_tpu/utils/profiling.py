"""Profiling / tracing utilities (SURVEY §5 "Tracing": the reference only has
wall-clock FPS logging; the TPU framework adds jax.profiler traces and
per-section timing)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Blocking wall-clock timer for named sections (device-synchronized)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: total {tot:.3f}s, {n}x, mean {tot / n * 1e3:.2f} ms")
        return "\n".join(lines)


def device_memory_stats() -> Dict[str, int]:
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: v for k, v in stats.items() if "bytes" in k}
    except Exception:
        return {}
