"""Host-side stage timers for the serving adapters (LMMS_OWC_HOST_PROF=1).

The xplane trace accounts for device time only; the residual wall-vs-device gap
(~15% of wall at the r4 flagship config, docs/architecture.md MFU table) is
host work. These accumulators attribute it: prepare-stage work that the
pipeline failed to hide (``prep_wait``), per-pool input assembly, the blocking
token fetch, and detokenization. Zero overhead unless ``LMMS_OWC_HOST_PROF``
is set (checked once at import).

Usage::

    with hostprof("detok"):
        ...
    hostprof_reset(); ...; hostprof_dump("label")
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager, nullcontext

ENABLED = bool(int(os.environ.get("LMMS_OWC_HOST_PROF", "0")))

_acc: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextmanager
def _timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _acc[name] += time.perf_counter() - t0
        _counts[name] += 1


def hostprof(name: str):
    """Context manager timing one host stage; no-op when disabled."""
    if not ENABLED:
        return nullcontext()
    return _timed(name)


def hostprof_reset() -> None:
    _acc.clear()
    _counts.clear()


def hostprof_dump(label: str = "") -> None:
    if not ENABLED or not _acc:
        return
    total = sum(_acc.values())
    rows = sorted(_acc.items(), key=lambda kv: -kv[1])
    print(f"[hostprof {label}] total attributed {total * 1e3:.0f} ms")
    for name, secs in rows:
        print(f"  {name:<18} {secs * 1e3:>8.0f} ms  x{_counts[name]}")
