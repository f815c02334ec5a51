"""Stage timing and throttled progress reporting.

The reference surrounds every stage with an indicatif progress bar
throttled to 5 Hz (cellfilter.rs:1629-1640, collate.rs:630-643,
quant.rs:1500-1511) and logs wall-clock for the rescue phase.  Here:

* :func:`stage_timer` wraps a pipeline stage, logging elapsed seconds
  and records/s at INFO when the stage finishes;
* :class:`Progress` emits in-place ``\\r``-style updates to stderr at
  most every 0.2 s, only when stderr is a TTY or ``AFT_PROGRESS=1``
  (``AFT_PROGRESS=0`` disables entirely — benches and tests stay
  clean).
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager


def _progress_enabled() -> bool:
    env = os.environ.get("AFT_PROGRESS")
    if env is not None:
        return env not in ("0", "false", "off")
    return sys.stderr.isatty()


class Progress:
    """Throttled (5 Hz) in-place progress line on stderr."""

    def __init__(self, label: str, unit: str = "records"):
        self.label = label
        self.unit = unit
        self.count = 0
        self.t0 = time.perf_counter()
        self._last = 0.0
        self._enabled = _progress_enabled()
        self._wrote = False

    def update(self, n: int) -> None:
        self.count += int(n)
        if not self._enabled:
            return
        now = time.perf_counter()
        if now - self._last < 0.2:
            return
        self._last = now
        rate = self.count / max(now - self.t0, 1e-9)
        sys.stderr.write(
            f"\r{self.label}: {self.count:,} {self.unit} "
            f"({rate:,.0f}/s)\x1b[K"
        )
        sys.stderr.flush()
        self._wrote = True

    def finish(self) -> None:
        if self._wrote:
            sys.stderr.write("\r\x1b[K")
            sys.stderr.flush()


@contextmanager
def stage_timer(log, stage: str, unit: str = "records"):
    """Context manager: yields a Progress; logs elapsed + rate at exit."""
    p = Progress(stage, unit)
    t0 = time.perf_counter()
    try:
        yield p
    finally:
        p.finish()
        dt = time.perf_counter() - t0
        if p.count:
            log.info(
                "%s: %s %s in %.2fs (%s %s/s)",
                stage, f"{p.count:,}", unit, dt,
                f"{p.count / max(dt, 1e-9):,.0f}", unit,
            )
        else:
            log.info("%s finished in %.2fs", stage, dt)
