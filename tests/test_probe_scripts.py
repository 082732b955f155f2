"""Probe-script units: the chain-timing modes of probe_policy_gap and
the serving-probe's bucket accounting run correctly on tiny shapes.

The full probes are TPU measurement tools (BENCH_NOTES round 4); these
tests pin their mechanics — mode dispatch, chain dependency, bucket
selection — so a refactor can't silently break the measurement
protocol between TPU runs.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_chain_modes_agree_on_results():
    """All three timing modes drive the same walk; each must complete
    a dependency chain and return a positive wall time."""
    from latentaugment_tpu import benchmark
    from scripts.probe_policy_gap import chain_times

    import jax

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=16, manifold_items=8, w_lpips=0.0)
    w0, crop_pos, _ = benchmark.example_walk_args(g_cfg, batch_size=4)
    walk = jax.jit(fns.walk)
    for mode in ("scalar", "fetch", "roundtrip"):
        dt = chain_times(walk, bundle, w0, crop_pos, 2, salt=3, mode=mode)
        assert dt > 0


def test_serving_bucket_selection_is_minimal():
    """The ladder must route a request to the SMALLEST bucket >= n and
    chunk oversize requests through the top bucket — the padding-waste
    bound the serving probe's 2x gate relies on."""
    from scripts.probe_serving import _load_serve_module

    mod = _load_serve_module()

    calls = []

    class FakeSvc(mod.GeneratorService):
        def __init__(self):  # bypass artifact loading
            self.z_dim, self.c_dim = 8, 0
            self.buckets = (1, 2, 4, 8)
            self.max_request_n = 100
            import threading
            self._compile_locks = {b: threading.Lock()
                                   for b in self.buckets}
            self._compiled = set(self.buckets)

        def _call(self, z, c):
            calls.append(z.shape[0])
            return np.zeros((z.shape[0], 2, 4, 4), np.float32)

    svc = FakeSvc()
    svc.generate(3)            # pad to 4
    svc.generate(8)            # exact top
    svc.generate(11)           # chunk: 8 + (3 -> bucket 4)
    assert calls == [4, 8, 8, 4], calls
    # Total padded waste per request is < one bucket step.
    assert sum(calls[2:]) - 11 < 8
