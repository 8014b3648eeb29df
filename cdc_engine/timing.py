"""Opt-in per-phase wall clocks (``CDC_TIMING=1``).

The scaling criterion (BASELINE.json:2) is gated by the per-commit SERIAL
term — driver-side work that does not divide by the core count (job
barriers, metadata fsyncs, footer stats). These probes decompose an
epoch's wall into named phases so BENCH/ANALYSIS can attribute the serial
share to specific code instead of fitting it from two points. Disabled
(the default) they cost one dict lookup per epoch phase."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

records: list[tuple[str, float]] = []


def enabled() -> bool:
    return os.environ.get("CDC_TIMING") == "1"


@contextmanager
def phase(name: str):
    if not enabled():
        yield
        return
    t0 = time.monotonic()
    try:
        yield
    finally:
        records.append((name, time.monotonic() - t0))


def drain() -> list[tuple[str, float]]:
    out = list(records)
    records.clear()
    return out
