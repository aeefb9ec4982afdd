"""Profiling and throughput instrumentation.

The reference's only observability is tqdm progress bars (SURVEY.md §5).
Here: wall-clock timers that block on device completion, particle-throughput
counters, and optional ``jax.profiler`` trace capture around a region.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


def block(tree):
    """Block until all arrays in a pytree are computed."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


@dataclass
class Timer:
    """Accumulating wall-clock timer with throughput reporting."""

    name: str = "timer"
    elapsed: float = 0.0
    count: int = 0
    _start: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._start
        self.count += 1
        return False

    def throughput(self, units: float) -> float:
        """units processed per second over the accumulated time."""
        return units / self.elapsed if self.elapsed > 0 else float("inf")


def timed(fn, *args, **kwargs):
    """Run ``fn``, block on its outputs, return ``(result, seconds)``."""
    start = time.perf_counter()
    out = block(fn(*args, **kwargs))
    return out, time.perf_counter() - start


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a ``jax.profiler`` trace around the region when a directory
    is given; no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
