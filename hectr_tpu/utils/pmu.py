"""Per-section timing -- the libpmu TEST_DO/TEST_DONE equivalent.

The reference brackets keygen, rotation keygen and the closed loop with
libpmu macros (src/ctr.c:528-533,570,597; SURVEY.md §2.4/§5).  Here the
same capability is a context manager that blocks on device work (so
async dispatch doesn't lie) and can optionally capture a jax.profiler
trace for perfetto.
"""

from __future__ import annotations

import contextlib
import sys
import time


class Timer:
    """Accumulates named section timings; prints on report()."""

    def __init__(self):
        self.sections: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, label: str, trace_dir: str | None = None):
        import jax

        if trace_dir:
            jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            try:
                jax.effects_barrier()
            except Exception:
                pass
            dt = time.perf_counter() - t0
            self.sections[label] = self.sections.get(label, 0.0) + dt
            if trace_dir:
                jax.profiler.stop_trace()
            print(f"[pmu] {label}: {dt:.3f}s", file=sys.stderr)

    def report(self) -> dict[str, float]:
        return dict(self.sections)


@contextlib.contextmanager
def timed(label: str):
    """One-off section timer (TEST_DO(label) ... TEST_DONE parity)."""
    t = Timer()
    with t.section(label):
        yield
