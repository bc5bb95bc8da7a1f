"""Timing/trace helpers (reference utils/debug.py analog).

``log_time`` injects a per-checkpoint wall-time callback. For device-side
profiling use ``jax.profiler`` traces; this module covers the reference's
lightweight host-side instrumentation surface.
"""

from .misc import log_time

__all__ = ["log_time"]
