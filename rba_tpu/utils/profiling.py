"""Tracing / profiling utilities.

SURVEY.md §5: the reference has no built-in tracing (only offline fvcore
FLOPs + leftover print_stats).  Here: a jax.profiler trace context for
TensorBoard-viewable device traces, and wall-clock stage timers that force
device completion through a scalar fetch (plain ``block_until_ready`` is
unreliable through remote TPU tunnels — measured in this repo's bench).
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/rba_trace"):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def force_sync(tree) -> float:
    """Force completion of all arrays in a pytree; returns a checksum (the
    device→host scalar fetch is the sync)."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype"):
            total += float(jnp.sum(leaf.astype(jnp.float32)))
    return total


class StageTimer:
    """Accumulate per-stage wall-clock times across iterations."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            force_sync(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}

    def report(self) -> str:
        return json.dumps({k: round(v * 1000, 2) for k, v in self.summary().items()})
