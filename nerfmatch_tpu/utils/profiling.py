"""Profiling / tracing utilities.

The reference's observability is wall-clock timers persisted into result
caches (``nerfmatch_evaluator.py:180,454,621``; see :class:`..utils.Timers`).
This module adds the TPU-native layer: ``jax.profiler`` trace capture around
arbitrary code regions, per-step trace annotations, and a simple device-side
memory report — usable from trainers (``--profile_dir``) and benchmarks.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir, enabled: bool = True):
    """Capture a jax.profiler trace (TensorBoard-compatible) for the block."""
    if not enabled or not log_dir:
        yield
        return
    log_dir = str(Path(log_dir))
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for the profiler timeline (usable as ctx manager)."""
    return jax.profiler.TraceAnnotation(name)


def step_annotation(step: int):
    return jax.profiler.StepTraceAnnotation("train_step", step_num=step)


def device_memory_stats():
    """Per-device memory stats dict (bytes in use / limit) where supported."""
    stats = {}
    for dev in jax.local_devices():
        try:
            s = dev.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(dev)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return stats
