"""Tracing/profiling helpers (SURVEY.md §5 "tracing/profiling").

Reference-class codes print wall-clock at best; here:
  * ``trace(dir)`` — context manager around ``jax.profiler.trace`` producing
    Perfetto/XProf traces of the superstep (view with xprof/tensorboard);
  * ``Stopwatch`` — host-side phase timer with ``block_until_ready`` fences
    at superstep granularity only (never inside the hot loop);
  * ``interactions_per_sec`` — the BASELINE.json:2 headline metric.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(out_dir: str = "out/traces"):
    """Profile everything inside the block into ``out_dir``."""
    with jax.profiler.trace(out_dir):
        yield


class Stopwatch:
    """Named phase timings; fence with a pytree to time device work."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                for leaf in jax.tree_util.tree_leaves(fence):
                    if hasattr(leaf, "block_until_ready"):
                        leaf.block_until_ready()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:24s} {tot:9.3f}s  x{n}  ({tot/n*1e3:.2f} ms/call)")
        return "\n".join(lines)


def interactions_per_sec(n: int, n_force_evals: int, wall_s: float) -> float:
    """N^2 pairwise interactions per force evaluation (BASELINE.json:2)."""
    return n * n * n_force_evals / wall_s


def wall_per_myr(wall_s: float, t_code: float, time_myr_per_code: float) -> Optional[float]:
    """Seconds of wall clock per simulated Myr (BASELINE.json:5 metric)."""
    myr = t_code * time_myr_per_code
    return wall_s / myr if myr > 0 else None
