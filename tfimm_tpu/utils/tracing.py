"""Profiler tracing helpers (SURVEY.md §5: the reference has no tracer; the
TPU-native equivalent is jax.profiler xplane traces for roofline checks)."""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf.

    >>> with trace("/tmp/trace"):
    ...     model.predict(x).block_until_ready()
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (TraceAnnotation context)."""
    return jax.profiler.TraceAnnotation(name)
