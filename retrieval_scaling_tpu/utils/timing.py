"""Timing + tracing utilities.

``time_exec`` mirrors the reference decorator (reference: utils/timing.py:5-17)
returning ``(result, seconds)``; ``Logger`` the tsv logger (:20-41).
``trace_stage`` upgrades the reference's ad-hoc prints to ``jax.profiler``
named traces when available (SURVEY §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time

logger = logging.getLogger(__name__)


def time_exec(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        return result, time.perf_counter() - start

    return wrapped


class Logger:
    """Append-only tab-separated record logger."""

    def __init__(self, path: str):
        self.path = path

    def log(self, *fields) -> None:
        with open(self.path, "a") as f:
            f.write("\t".join(str(x) for x in fields) + "\n")


@contextlib.contextmanager
def trace_stage(name: str):
    """Wall-clock log + jax.profiler trace annotation for a pipeline stage."""
    start = time.perf_counter()
    ctx = None
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
        ctx.__enter__()
    except Exception:
        ctx = None
    try:
        yield
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
        logger.info("[stage %s] %.2fs", name, time.perf_counter() - start)
