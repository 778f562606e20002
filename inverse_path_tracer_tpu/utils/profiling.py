"""Profiling hooks.

The reference has zero tracing/timers (SURVEY.md §5).  Here: a context
manager around jax.profiler emitting TensorBoard traces, plus a tiny
block_until_ready timer for rays/sec measurements (what bench.py uses).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a TensorBoard/XPlane trace of the enclosed block when
    log_dir is set; no-op otherwise.  View with
    `tensorboard --logdir <dir>` or xprof."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Named wall-clock stages with device synchronization."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0
