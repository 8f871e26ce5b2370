"""Phase-scoped timing + profiling (E5).

The PetscLogStage analog (reference elasticity.c:128-131, 230-233, 381-384,
627-630 register the four stages "DM and Vector Setup", "libCEED Setup",
"SNES Setup", "SNES Solve"; surfaced by -log_view, README.rst:114-116).

Also wraps jax.profiler for XLA-level traces: `with trace_dir(...)` dumps a
TensorBoard-compatible profile of everything inside.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageLog:
    """Accumulating named phase timers."""

    stages: dict = field(default_factory=dict)
    _order: list = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.stages:
                self.stages[name] = [0.0, 0]
                self._order.append(name)
            self.stages[name][0] += dt
            self.stages[name][1] += 1

    def report(self) -> str:
        """-log_view style summary."""
        lines = ["Stage                          Time (s)   Count"]
        for name in self._order:
            t, c = self.stages[name]
            lines.append(f"{name:30s} {t:9.4f}   {c:5d}")
        return "\n".join(lines)


GLOBAL_LOG = StageLog()


@contextlib.contextmanager
def trace_dir(path: str):
    """XLA profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
