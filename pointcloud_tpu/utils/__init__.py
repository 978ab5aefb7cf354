"""Shared utilities: profiling/tracing, debug helpers."""

from pointcloud_tpu.utils.profiling import timeit, trace, StepTimer

__all__ = ["timeit", "trace", "StepTimer"]
