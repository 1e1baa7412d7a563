"""Profiling / tracing subsystem.

The reference has none (print checkpoints only, SURVEY.md §5.1).  Here:
per-stage wall-clock timers with a process-global report, and optional
`jax.profiler` trace capture around any stage via STREAMINGT2V_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, List

_STAGE_TIMES: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def stage_timer(name: str):
    trace_dir = os.environ.get("STREAMINGT2V_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(os.path.join(trace_dir, name))
    t0 = time.time()
    with ctx:
        yield
    _STAGE_TIMES[name].append(time.time() - t0)


def timing_report() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, times in _STAGE_TIMES.items():
        out[name] = {
            "calls": len(times),
            "total_s": round(sum(times), 3),
            "mean_s": round(sum(times) / len(times), 3),
            "last_s": round(times[-1], 3),
        }
    return out


def reset_timers() -> None:
    _STAGE_TIMES.clear()
