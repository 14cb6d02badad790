"""Section timing + device profiling.

TPU-native replacement for the reference's compile-flag Timer macro system
(util/timer.hpp:18-74): named accumulating section timers printed on demand,
plus a thin wrapper over the JAX profiler for device traces.  Unlike the
reference (zero-cost only when compiled out), these are zero-cost when
disabled at runtime and force true device synchronization around sections so
host-side numbers are meaningful on an asynchronous backend.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

_ENABLED = False
_ACC: Dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [count, total_s]


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def section(name: str, sync: object = None):
    """Accumulate wall time of a section; pass a jax array as ``sync`` to
    block on it (true device completion) before stopping the clock."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        acc = _ACC[name]
        acc[0] += 1
        acc[1] += time.perf_counter() - t0


def report() -> str:
    lines = ["section                     count     total_ms     avg_ms"]
    for name, (n, total) in sorted(_ACC.items()):
        avg = total / n * 1e3 if n else 0.0
        lines.append(f"{name:<26} {n:>6} {total * 1e3:>12.2f} {avg:>10.3f}")
    return "\n".join(lines)


def reset() -> None:
    _ACC.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace (xplane) for offline roofline analysis."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
