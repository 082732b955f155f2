"""Tensor/runtime helpers.

Parity: reference models/stylegan3/torch_utils/misc.py — symbolic shape
assertions, profiling decorator, infinite data-parallel sampler, param
copying, replica-consistency check, module summary. Torch-specific
machinery (tracer-warning suppression, ddp_sync, constant caching per
device) collapses under JAX's functional model.
"""

import functools
import re

import numpy as np

import jax
import jax.numpy as jnp


def nan_to_num(x, nan=0.0, posinf=None, neginf=None):
    """Parity: misc.nan_to_num shim (jnp has it natively)."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def constant(value, shape=None, dtype=None):
    """Build a (host-cached at trace time) constant array."""
    arr = jnp.asarray(value, dtype=dtype)
    if shape is not None:
        arr = jnp.broadcast_to(arr, shape)
    return arr


def assert_shape(tensor, ref_shape):
    """Shape assertion tolerant of None wildcards (parity: misc.assert_shape).

    Works on traced values too — shapes are static under jit.
    """
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, "
            f"expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is None:
            continue
        if size != ref_size:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def profiled_function(fn):
    """Annotate a function for the JAX profiler (parity: misc.profiled_function
    wrapping torch record_function)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


class InfiniteSampler:
    """Infinite windowed-shuffle sampler, rank-aware.

    Parity: torch_utils/misc.py:111-142 — yields dataset indices forever,
    shuffling within a sliding window; `rank`/`num_replicas` stride the
    stream for data-parallel hosts (use jax.process_index()/count()).
    """

    def __init__(self, dataset_size, rank=0, num_replicas=1, shuffle=True,
                 seed=0, window_size=0.5):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self):
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield order[i]
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def copy_params_and_buffers(src_tree, dst_tree, require_all=False):
    """Copy matching leaves between param trees (parity: misc.py:147-162)."""
    flat_src = dict(_flatten(src_tree))
    out = {}

    def rebuild(prefix, node):
        if isinstance(node, dict):
            return {k: rebuild(f"{prefix}.{k}" if prefix else k, v)
                    for k, v in node.items()}
        if prefix in flat_src:
            src = np.asarray(flat_src[prefix])
            assert src.shape == tuple(np.asarray(node).shape), prefix
            return jnp.asarray(src)
        if require_all:
            raise KeyError(prefix)
        return node

    return rebuild("", dst_tree)


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, name)
        else:
            yield name, v


def check_replica_consistency(tree, mesh=None):
    """Assert replicated params are bit-identical across devices.

    Parity: misc.check_ddp_consistency (broadcast-and-compare) — here we
    fetch each addressable shard and compare on host.
    """
    mismatches = []
    for name, leaf in _flatten(tree):
        arr = leaf
        if hasattr(arr, "addressable_shards") and len(arr.addressable_shards) > 1:
            datas = [np.asarray(s.data) for s in arr.addressable_shards]
            for d in datas[1:]:
                if not np.array_equal(datas[0], d):
                    mismatches.append(name)
                    break
    assert not mismatches, f"Replica mismatch: {mismatches}"


def print_param_summary(tree, name="model", max_rows=None):
    """Param-tree summary table (parity: misc.print_module_summary)."""
    rows = [(n, tuple(np.asarray(v).shape), int(np.prod(np.asarray(v).shape)))
            for n, v in _flatten(tree)]
    total = sum(r[2] for r in rows)
    print(f"\n{name:<40s} {'shape':<20s} {'params':>12s}")
    print("-" * 74)
    for n, shape, cnt in rows[:max_rows]:
        print(f"{n:<40s} {str(list(shape)):<20s} {cnt:>12,d}")
    if max_rows is not None and len(rows) > max_rows:
        print(f"... ({len(rows) - max_rows} more)")
    print("-" * 74)
    print(f"{'Total':<40s} {'':<20s} {total:>12,d}\n")
    return total
