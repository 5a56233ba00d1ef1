"""Profiling & timing helpers.

The reference has no built-in profiler — its benchmarks hand-roll per-device
timing events (`bench/generation/metrics/latency.py:24-55`). The TPU-native
equivalents: `jax.profiler` traces (viewable in TensorBoard / Perfetto) and a
wall-clock timer that forces completion with a data-dependent readback
(`block_until_ready` alone is not reliable through remote TPU transports).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


__all__ = ["trace", "Timer", "timeit"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/quanto_tpu_trace"):
    """Capture a jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _sync(x) -> None:
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    if leaves:
        jax.device_get(jnp.sum(leaves[0].astype(jnp.float32) if jnp.issubdtype(leaves[0].dtype, jnp.floating) else leaves[0].astype(jnp.int32)))


class Timer:
    """Wall-clock timer with forced device synchronization."""

    def __init__(self):
        self.elapsed: Optional[float] = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0


def timeit(fn, *args, iterations: int = 3, warmup: int = 1, **kwargs) -> dict:
    """Best-of-N timing of `fn(*args, **kwargs)`, syncing on the output."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
        _sync(out)
    best = float("inf")
    for _ in range(iterations):
        t0 = time.time()
        out = fn(*args, **kwargs)
        _sync(out)
        best = min(best, time.time() - t0)
    return {"best_s": best, "output": out}
