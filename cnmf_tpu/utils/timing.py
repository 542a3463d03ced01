"""Per-stage timing and device profiling.

The reference has no tracing or profiling at all (SURVEY §5 — only print
statements). This module adds lightweight wall-clock stage timers (collected
into a process-global registry, dumped via ``timings()``) and an optional
``jax.profiler`` trace context enabled with CNMF_TPU_PROFILE_DIR.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, List

_TIMINGS: Dict[str, List[float]] = defaultdict(list)
_VERBOSE = os.environ.get("CNMF_TPU_TIMINGS", "0") == "1"


@contextlib.contextmanager
def stage_timer(name: str):
    """Record wall-clock of a pipeline stage; print when CNMF_TPU_TIMINGS=1."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TIMINGS[name].append(dt)
        if _VERBOSE:
            import sys
            print(f"[cnmf-tpu timing] {name}: {dt:.3f}s", file=sys.stderr, flush=True)


def timings() -> Dict[str, List[float]]:
    """All recorded stage timings this process (name → list of seconds)."""
    return dict(_TIMINGS)


def reset_timings() -> None:
    _TIMINGS.clear()


def timed(name: str):
    """Decorator: record the wrapped call as a stage (and profile it when
    CNMF_TPU_PROFILE_DIR is set)."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with stage_timer(name), profiler_trace(name):
                return fn(*args, **kwargs)

        return wrapper
    return deco


@contextlib.contextmanager
def profiler_trace(name: str = "trace"):
    """jax.profiler trace context, active when CNMF_TPU_PROFILE_DIR is set."""
    profile_dir = os.environ.get("CNMF_TPU_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(profile_dir, name)):
        yield
