"""Observability: phase timers and jax profiler hooks.

The reference's only instrumentation is an unused wall-clock pair around
``generate`` (SURVEY.md §5: tracing/profiling absent). This module provides
the framework-level replacements: a nestable phase timer with device
synchronisation, structured stat export, and one-call TPU trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

from .aot import aot_jit


@aot_jit
def _first_scalar(leaf):
    import jax.numpy as jnp
    return jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))


def force_completion(x) -> None:
    """Truly wait for a device value. ``block_until_ready`` is a no-op on
    this image's axon (TPU tunnel) backend, so we reduce to a scalar on
    device and fetch it — a few ms of overhead, correct everywhere.
    One jitted program per shape (first use costs a ~1-2 s tunnel compile;
    aot_jit makes it a disk hit in later processes — utils/aot.py)."""
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "dtype"):
            float(_first_scalar(leaf))


class PhaseTimer:
    """Accumulating wall-clock timer with optional device sync per phase.

    >>> timer = PhaseTimer()
    >>> with timer.phase("denoise"):
    ...     ...
    >>> timer.stats()
    {"denoise": {"total_s": ..., "count": ..., "mean_s": ...}}
    """

    def __init__(self, sync: bool = True):
        #: when False, phases time only host-side dispatch (async device work
        #: is NOT awaited); callers block explicitly for accurate profiles
        self.sync = sync
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                force_completion(sync_value)
            dt = time.perf_counter() - t0
            self._total[name] += dt
            self._count[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self._total[name] += seconds
        self._count[name] += 1

    def stats(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(self._total[k], 4), "count": self._count[k],
                "mean_s": round(self._total[k] / max(self._count[k], 1), 4)}
            for k in self._total
        }

    def report(self) -> str:
        return json.dumps(self.stats(), indent=2)


@contextlib.contextmanager
def tpu_trace(logdir: str = "/tmp/deepv_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
