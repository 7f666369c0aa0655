"""Tracing / profiling utilities (SURVEY.md §5).

The reference has almost no observability: a per-batch wall-clock print in
the sampler (``/root/reference/scripts/sample_diffusion.py:198-205``), an
inference timer in ``log_images`` and a thop FLOPs hook. TPU-native
replacements:

  * ``trace(logdir)`` — ``jax.profiler`` device trace (open in
    TensorBoard / xprof); ``annotate(name)`` adds named regions.
  * ``device_sync(x)`` — a reliable timing barrier. On the remote-TPU
    (axon) platform ``block_until_ready`` returns before device execution
    finishes; fetching a scalar to host is the barrier that works
    everywhere.
  * ``ThroughputMeter`` — images/sec accounting with warmup skip, the
    BASELINE.md metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace into ``logdir`` (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('decode'): ...``."""
    return jax.profiler.TraceAnnotation(name)


def device_sync(x) -> float:
    """Block until the device has produced ``x``; returns a scalar fetch.

    ``jax.block_until_ready`` is not a reliable barrier through the axon
    tunnel (dispatch is acknowledged before execution); a scalar readback
    (~1 RTT) is."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


class ThroughputMeter:
    """images/sec over timed batches, skipping warmup iterations."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._seen = 0
        self._items = 0
        self._secs = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int) -> float:
        """Record a batch of n_items; returns this batch's items/sec."""
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._items += n_items
            self._secs += dt
        return n_items / dt if dt > 0 else float("inf")

    @property
    def items_per_sec(self) -> float:
        return self._items / self._secs if self._secs > 0 else 0.0
