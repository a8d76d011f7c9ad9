"""Runtime utilities: timing, stdout-tee logging, profiler hooks.

Replaces the reference's utils/pyutils.py helpers (Timer :49-72, Logger
:7-17) and adds the tracing the reference lacks (SURVEY.md §5: "Tracing /
profiling: absent").
"""

from .logging import Logger, Timer, ProgressTimer
from .profiling import trace, annotate

__all__ = ["Logger", "Timer", "ProgressTimer", "trace", "annotate"]
