"""Tracing / metrics — greenfield (the reference has none; SURVEY.md §5:
only date-stamped bash echo and C++ progress counters every 4-10 M
records, count_kmer.cpp:223-224).

- :class:`StageTimer`: wall-clock + item counters per pipeline stage,
  logged as ``stage: N items in S s (R items/s)`` and collected into a
  metrics dict dumped to ``<output>/metrics.json``.
- :func:`trace`: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of the device work when enabled via
  ``PANGAEA_TPU_TRACE=<dir>`` (zero overhead otherwise).
- :func:`annotate`: named TraceAnnotation for kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

log = logging.getLogger(__name__)

TRACE_ENV = "PANGAEA_TPU_TRACE"


@dataclass
class StageStats:
    seconds: float = 0.0
    items: int = 0
    unit: str = "items"

    @property
    def rate(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


class StageTimer:
    """Accumulates per-stage wall time + throughput counters."""

    def __init__(self):
        self.stages: Dict[str, StageStats] = {}

    @contextlib.contextmanager
    def stage(self, name: str, unit: str = "items") -> Iterator[StageStats]:
        st = self.stages.setdefault(name, StageStats(unit=unit))
        t0 = time.time()
        try:
            yield st
        finally:
            st.seconds += time.time() - t0
            if st.items:
                log.info("%s: %d %s in %.2fs (%.0f %s/s)", name, st.items,
                         st.unit, st.seconds, st.rate, st.unit)
            else:
                log.info("%s: %.2fs", name, st.seconds)

    def add(self, name: str, items: int, unit: str = "items") -> None:
        self.stages.setdefault(name, StageStats(unit=unit)).items += items

    def as_dict(self) -> Dict:
        return {name: {"seconds": round(s.seconds, 4), "items": s.items,
                       "unit": s.unit, "rate": round(s.rate, 2)}
                for name, s in self.stages.items()}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2)


@contextlib.contextmanager
def trace(name: str = "pangaea", trace_dir: Optional[str] = None):
    """jax.profiler trace when PANGAEA_TPU_TRACE (or trace_dir) is set."""
    trace_dir = trace_dir or os.environ.get(TRACE_ENV)
    if not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    log.info("profiler trace -> %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def annotate(name: str):
    """Kernel-level trace annotation (no-op cost when not tracing)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
