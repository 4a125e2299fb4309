"""Shared utilities: profiling, seeding."""

from .profiling import phase_timer, trace_to

__all__ = ["phase_timer", "trace_to"]
