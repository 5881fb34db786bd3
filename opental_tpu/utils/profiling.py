"""Profiling / tracing hooks.

The reference's only perf instrumentation is ad-hoc cuda-synchronized
timers (thumos14/BDNet.py:570-583, threshold.py:86-126). Here profiling
is first-class: jax.profiler trace capture around any callable plus a
phase timer whose reports survive into metrics JSONL.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace:
    with profiling.trace('/tmp/tb'): run_step()."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock phase timer (device-synchronized)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None
              ) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return {name: self.totals[name] / max(self.counts[name], 1)
                for name in self.totals}

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, 'w') as f:
            json.dump({'mean_seconds': self.report(),
                       'total_seconds': self.totals,
                       'counts': self.counts}, f, indent=2)


def device_memory_stats() -> Dict[str, float]:
    """Best-effort per-device HBM stats (bytes)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                'bytes_in_use': s.get('bytes_in_use', 0),
                'peak_bytes_in_use': s.get('peak_bytes_in_use', 0),
            }
        except Exception:
            continue
    return stats
