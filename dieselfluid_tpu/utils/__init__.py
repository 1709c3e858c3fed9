"""Utilities: structured logging, profiling/tracing, jit helpers.

The reference has no tracing/profiling beyond printf banners and Go
micro-benchmarks (SURVEY.md §5); this package provides the production
observability layer: step timers with device sync, jax profiler trace
capture, and a simulation logger.
"""

from dieselfluid_tpu.utils.profiling import StepTimer, trace_to  # noqa: F401
from dieselfluid_tpu.utils.logging import get_logger, log_banner  # noqa: F401
