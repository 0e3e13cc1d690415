"""Profiling / tracing hooks.

The reference only wall-clocks whole scans (SURVEY.md §5: no OpenCL event
profiling, no tracing). Here: ``jax.profiler`` trace capture around any
scan region (viewable in TensorBoard/Perfetto), plus a lightweight
section timer for host-side phases.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace of the enclosed region (no-op when
    ``log_dir`` is falsy)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class SectionTimer:
    """Accumulating host-side phase timer with a one-line report."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.sections.values()) or 1.0
        parts = [
            f"{k}={v*1e3:.1f}ms({v/total:.0%})" for k, v in sorted(
                self.sections.items(), key=lambda kv: -kv[1]
            )
        ]
        return " ".join(parts)
