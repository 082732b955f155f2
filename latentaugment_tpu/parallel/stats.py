"""Distributed scalar-metrics collection.

Parity: reference torch_utils/training_stats.py — per-name moment
triples (n, sum x, sum x^2) with cross-replica reduction. The
torch.distributed.all_reduce of moment vectors becomes a `jax.lax.psum`
when used inside shard_map/jit, or a host-side accumulate otherwise.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

_counters = collections.defaultdict(lambda: np.zeros(3, dtype=np.float64))


def moments(x):
    """[n, sum, sum_sq] of an array — the payload to accumulate/psum."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x),
                      jnp.sum(jnp.square(x))])


def psum_moments(m, axis_name):
    """Reduce a moment triple across mesh axis `axis_name` (inside shard_map)."""
    return jax.lax.psum(m, axis_name)


def report(name, value):
    """Accumulate host-side (parity: training_stats.report)."""
    m = np.asarray(moments(value), dtype=np.float64)
    _counters[name] += m
    return value


def report0(name, value, process_index=None):
    """Accumulate only on process 0 (parity: training_stats.report0)."""
    idx = process_index if process_index is not None else jax.process_index()
    if idx == 0:
        report(name, value)
    return value


class Collector:
    """Query means/stds of reported counters and reset deltas."""

    def __init__(self, regex=".*", keep_previous=True):
        import re

        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._cumulative = collections.defaultdict(lambda: np.zeros(3))
        self._deltas = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self):
        for name in self.names():
            total = np.array(_counters[name])
            self._deltas[name] = total - self._cumulative[name]
            self._cumulative[name] = total
        if not self._keep:
            for name in self.names():
                _counters[name][:] = 0
                self._cumulative[name][:] = 0

    def _delta(self, name):
        return self._deltas.get(name, np.zeros(3))

    def num(self, name):
        return int(self._delta(name)[0])

    def mean(self, name):
        d = self._delta(name)
        return float(d[1] / d[0]) if d[0] > 0 else float("nan")

    def std(self, name):
        d = self._delta(name)
        if d[0] <= 1:
            return 0.0 if d[0] == 1 else float("nan")
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean ** 2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self):
        from ..utils.util_easydict import EasyDict

        out = EasyDict()
        for name in self.names():
            out[name] = EasyDict(num=self.num(name), mean=self.mean(name),
                                 std=self.std(name))
        return out
