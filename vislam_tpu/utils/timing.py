"""Per-stage timing statistics.

Role of the reference's manual clock() spans and printStatistics reports
(/root/reference/src/Camera.cpp:325-356, src/Matcher.cpp:369-382,
src/Imu.cpp:449-453): running mean latency per pipeline stage, printed as a
CLI report. Host-side; for device-level profiles use jax.profiler around the
jitted step.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class StageTimer:
    """Accumulates wall-time statistics per named stage."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.count[name]
        return 1000.0 * self.total[name] / c if c else 0.0

    def report(self) -> str:
        """Per-stage mean latency table (reference printStatistics parity)."""
        lines = ["stage                     mean_ms   calls"]
        for name in sorted(self.total):
            lines.append(f"{name:<24} {self.mean_ms(name):>8.3f} {self.count[name]:>7d}")
        return "\n".join(lines)
