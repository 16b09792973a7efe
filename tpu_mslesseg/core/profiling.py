"""Tracing / profiling: stage timers + optional jax.profiler traces.

The reference has no profiling beyond the per-epoch ``time`` column
(SURVEY §5). Here every stage can be timed (`stage_timer`), and device
traces are a flag away: set ``TPU_MSLESSEG_TRACE_DIR`` to capture a
jax.profiler trace of any `stage_timer` region for TensorBoard.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("profiling")

_TIMINGS: dict = {}


@contextmanager
def stage_timer(name: str):
    """Wall-clock a pipeline region; optionally capture a device trace."""
    trace_dir = os.environ.get("TPU_MSLESSEG_TRACE_DIR")
    t0 = time.time()
    if trace_dir:
        import jax

        with jax.profiler.trace(os.path.join(trace_dir, name)):
            yield
    else:
        yield
    dt = time.time() - t0
    _TIMINGS.setdefault(name, []).append(dt)
    logger.info(f"⏱️ {name}: {dt:.2f}s")


def timings_summary() -> dict:
    """{stage: {"total_s", "calls", "mean_s"}} for everything timed."""
    return {
        k: {
            "total_s": round(sum(v), 3),
            "calls": len(v),
            "mean_s": round(sum(v) / len(v), 3),
        }
        for k, v in _TIMINGS.items()
    }


def reset_timings():
    _TIMINGS.clear()
