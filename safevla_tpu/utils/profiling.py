"""Profiling & step timing — first-class (the reference has none; SURVEY §5.1).

Two layers:
  * `profile_trace(logdir)`: context manager around the JAX profiler — one
    call captures device traces viewable in TensorBoard/Perfetto.
  * `StageTimer`: lightweight named-section wall timing with EMA summaries,
    for the per-stage breakdown (ingest / device step / env step / update)
    that rollout loops log.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def profile_trace(logdir: str, with_python: bool = False) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.means: Dict[str, float] = {}
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            prev = self.means.get(name)
            self.means[name] = dt if prev is None else self.ema * prev + (1 - self.ema) * dt

    def summary(self, prefix: str = "time/") -> Dict[str, float]:
        return {f"{prefix}{k}": v for k, v in self.means.items()}

    def reset(self):
        self.means.clear()
        self.totals.clear()
        self.counts.clear()
