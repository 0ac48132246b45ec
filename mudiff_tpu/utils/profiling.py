"""Profiling / tracing hooks.

The reference had manual timers only (engine/train.py:756, :1056, CUDA
memory trackers at :102-117, and a MUDIFF_DEBUG_SYNC serialization
switch at :50-53).  TPU-native equivalents:

* ``maybe_profile`` — wraps a step range in a ``jax.profiler`` trace
  when MUDIFF_PROFILE=<outdir> is set (view with tensorboard or xprof).
* ``device_memory_stats`` — per-device HBM usage (replaces log_cuda).
* ``StepTimer`` — wall/data-time split identical in spirit to the
  reference's structured [TRAIN] log fields.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_profile(step: int, start: int = 10, num: int = 5) -> Iterator[None]:
    """Trace steps [start, start+num) into $MUDIFF_PROFILE if set."""
    outdir = os.environ.get("MUDIFF_PROFILE")
    active = outdir and start <= step < start + num
    if active and step == start:
        jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        if active and step == start + num - 1:
            jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in GiB (empty dict if the backend doesn't
    expose them)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use_gib": s.get("bytes_in_use", 0) / 2 ** 30,
                "peak_bytes_gib": s.get("peak_bytes_in_use", 0) / 2 ** 30,
                "bytes_limit_gib": s.get("bytes_limit", 0) / 2 ** 30,
            }
    return out


class StepTimer:
    """Accumulates data-wait vs total time over a logging window."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._window_start = time.time()
        self._mark = time.time()
        self.data_time = 0.0

    def mark_data_ready(self) -> None:
        self.data_time += time.time() - self._mark

    def mark_step_done(self) -> None:
        self._mark = time.time()

    def window(self) -> float:
        return time.time() - self._window_start
