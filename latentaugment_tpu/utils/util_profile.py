"""Profiling helpers (parity: reference tracing/profiling, SURVEY.md §5).

The reference wraps hot functions in torch.autograd.profiler
record_function and hand-times loss terms per epoch. Here:
  * `profiled_function` (utils/util_misc.py) adds jax.named_scope labels
    visible in XLA traces,
  * `trace(dir)` captures a full device trace viewable in TensorBoard /
    Perfetto,
  * `Timer` collects host-side wall times into named buckets (the
    stats_time analogue).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-time buckets with mean/total reporting."""

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def section(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.time() - t0)

    def mean(self, name):
        vals = self.times.get(name, [])
        return sum(vals) / len(vals) if vals else float("nan")

    def total(self, name):
        return sum(self.times.get(name, []))

    def report(self):
        for name, vals in self.times.items():
            print(f"{name:<24s} n={len(vals):<5d} mean={self.mean(name):.4f}s "
                  f"total={self.total(name):.3f}s")
