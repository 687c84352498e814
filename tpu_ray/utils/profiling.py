"""Tracing / profiling hooks.

The reference had no in-code instrumentation (profiling was external GHC
eventlog runs hand-logged into perflogs.org - SURVEY.md section 5).  Here:

* :func:`profile_trace` wraps a block in a ``jax.profiler`` trace usable
  with TensorBoard/XProf (``python -m tpu_ray --profile DIR ...``).
* :class:`WaveTimer` records per-wave wall times (the analog of the
  reference's per-row progress) and prints a summary.
"""
from __future__ import annotations

import contextlib
import sys
import time
from typing import List


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace if ``log_dir`` is given, else a no-op."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"profiler trace written to {log_dir}", file=sys.stderr)


class WaveTimer:
    """Wall-time per wave; mirrors perflogs.org's hand-kept tables."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        if self.enabled:
            self._t0 = time.perf_counter()

    def stop(self):
        if self.enabled and self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> str:
        if not self.times:
            return "no waves timed"
        t = self.times
        return (f"{len(t)} waves: total {sum(t):.3f}s, "
                f"mean {sum(t) / len(t) * 1e3:.1f}ms, "
                f"min {min(t) * 1e3:.1f}ms, max {max(t) * 1e3:.1f}ms")
