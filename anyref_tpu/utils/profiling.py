"""Profiler hooks (greenfield — SURVEY.md §5 notes the reference has none).

``trace`` wraps a region in a jax.profiler trace written to a directory
viewable with tensorboard/xprof; ``annotate`` names a region inside a trace.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device traces (usable as decorator or context)."""
    return jax.profiler.TraceAnnotation(name)
