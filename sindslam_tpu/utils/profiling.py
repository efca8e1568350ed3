"""Per-stage timing instrumentation.

The reference instruments every DynaDetect stage with ``cv::getTickCount``
and prints running means per frame (``src/DynaDetect.cc:1384,1643-1649``,
driver timers ``rgbd_tum_noros.cc:198-209``). This module keeps that CLI
feature: named stage timers with running statistics, plus an optional
``jax.profiler`` trace context for device-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; prints running means."""

    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def mean_ms(self, name: str) -> float:
        return 1000.0 * self.total[name] / max(self.count[name], 1)

    def report(self) -> str:
        lines = [f"  {name:<24s} {self.mean_ms(name):8.2f} ms/frame "
                 f"(x{self.count[name]})"
                 for name in sorted(self.total, key=lambda n: -self.total[n])]
        return "stage timing (means):\n" + "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Optional jax.profiler trace (open with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
