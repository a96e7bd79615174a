"""Profiling / tracing utilities.

The reference has no profiler (SURVEY.md §5.1); this build adds first-class
tracing: ``trace()`` wraps jax.profiler trace capture (view in TensorBoard or
xprof), ``StepTimer`` records per-step wall times with warmup discard, and
``flops_estimate`` reports the XLA cost analysis of a compiled function so
benchmarks can cite achieved-vs-peak utilization.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture around a block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with warmup discard and summary stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": float("nan"), "steps": 0}
        ts = sorted(self.times)
        return {
            "mean_s": sum(ts) / len(ts),
            "p50_s": ts[len(ts) // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
            "steps": len(ts),
        }


def flops_estimate(jitted_fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis (flops / bytes accessed) of a compiled function."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return {"flops": cost.get("flops", float("nan")),
                "bytes_accessed": cost.get("bytes accessed", float("nan"))}
    except Exception:
        return {"flops": float("nan"), "bytes_accessed": float("nan")}


def count_params(params) -> int:
    import jax
    return sum(x.size for x in jax.tree.leaves(params))


def model_summary(params, path: Optional[str] = None) -> str:
    """Param-count summary per top-level group (reference writes
    model_summary.txt, training.py:267-282)."""
    import jax
    lines = []
    total = 0
    for key, sub in params.items():
        n = count_params(sub)
        total += n
        lines.append(f"{key:30s} {n/1e6:10.3f}M")
    lines.append(f"{'TOTAL':30s} {total/1e6:10.3f}M")
    text = "\n".join(lines)
    if path:
        with open(path, "w") as f:
            f.write(text + "\n")
    return text
