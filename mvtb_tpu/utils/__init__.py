"""Utilities: profiling, step timing."""

from mvtb_tpu.utils.profiling import StepTimer, trace

__all__ = ["StepTimer", "trace"]
