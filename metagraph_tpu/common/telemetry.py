"""Tracing / telemetry: span timers, throughput counters, memory.

Replaces the reference's Timer + logger->trace spans + get_curr_RSS
(metagraph/src/common/unix_tools.hpp:18-29, cli/build.cpp:53,139) with a
structured span logger; also hooks jax.profiler for device traces when
METAGRAPH_TPU_TRACE_DIR is set.
"""

from __future__ import annotations

import contextlib
import os
import resource
import sys
import time
from typing import Dict, Iterator, Optional

VERBOSE = os.environ.get("METAGRAPH_TPU_VERBOSE", "0") != "0"
_TRACE_DIR = os.environ.get("METAGRAPH_TPU_TRACE_DIR")


def get_curr_rss() -> int:
    """CURRENT resident set size in bytes (the reference's get_curr_RSS
    reads /proc too; ru_maxrss would report the process PEAK and hide
    per-stage deltas after memory is freed)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGESIZE")
    except (OSError, IndexError, ValueError):
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()

    def elapsed(self) -> float:
        return time.time() - self._t0


_spans: Dict[str, float] = {}


@contextlib.contextmanager
def span(name: str, items: Optional[int] = None,
         unit: str = "items") -> Iterator[None]:
    """Timed span; logs wall time, RSS delta, and throughput."""
    t0 = time.time()
    rss0 = get_curr_rss()
    profiler_ctx = None
    if _TRACE_DIR:
        import jax
        profiler_ctx = jax.profiler.TraceAnnotation(name)
        profiler_ctx.__enter__()
    try:
        yield
    finally:
        if profiler_ctx is not None:
            profiler_ctx.__exit__(None, None, None)
        dt = time.time() - t0
        _spans[name] = _spans.get(name, 0.0) + dt
        if VERBOSE or items:
            rate = f", {items / max(dt, 1e-9) / 1e6:.2f} M{unit}/s" \
                if items else ""
            print(f"[span] {name}: {dt:.3f}s"
                  f" (rss {get_curr_rss() / 1e9:.2f} GB,"
                  f" +{(get_curr_rss() - rss0) / 1e6:.0f} MB{rate})",
                  file=sys.stderr, flush=True)


def span_totals() -> Dict[str, float]:
    return dict(_spans)


@contextlib.contextmanager
def device_trace(out_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace around a region (view with TensorBoard/XProf)."""
    out = out_dir or _TRACE_DIR
    if not out:
        yield
        return
    import jax
    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
