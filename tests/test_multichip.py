"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np

import jax

from latentaugment_tpu import benchmark
from latentaugment_tpu.parallel import mesh as pmesh
import pytest


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_walk_matches_single_device():
    """Batch-sharded walk must produce identical results to unsharded."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2, crop_size=16,
        manifold_items=8, w_lpips=0.0)  # no VGG -> faster
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch_size=8)

    img_single, ws_single, _ = jax.jit(fns.walk)(bundle, w0, crop_pos, synth_key)

    mesh = pmesh.get_mesh(8)
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    walk_sharded = jax.jit(fns.walk, in_shardings=(repl, batch, repl, repl),
                           out_shardings=(batch, batch, repl))
    img_sh, ws_sh, _ = walk_sharded(jax.device_put(bundle, repl),
                                    jax.device_put(w0, batch), crop_pos, synth_key)

    # GSPMD re-associates the batch-mean reductions across shards; only
    # reduction-order float noise is acceptable.
    np.testing.assert_allclose(np.asarray(img_single), np.asarray(img_sh),
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ws_single), np.asarray(ws_sh),
                               rtol=1e-2, atol=2e-3)


def test_psum_moments_shard_map():
    """Moment triples reduce correctly across the mesh (training_stats parity)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from latentaugment_tpu.parallel import stats

    mesh = pmesh.get_mesh(8)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)

    def per_shard(xs):
        m = stats.moments(xs)
        return stats.psum_moments(m, "data")

    fn = shard_map(per_shard, mesh=mesh, in_specs=P("data"), out_specs=P())
    m = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(m[0], 16)
    np.testing.assert_allclose(m[1], x.sum())
    np.testing.assert_allclose(m[2], (x ** 2).sum())


def test_check_replica_consistency():
    from latentaugment_tpu.utils.util_misc import check_replica_consistency

    mesh = pmesh.get_mesh(8)
    tree = {"a": jax.device_put(np.ones((8, 4), np.float32),
                                pmesh.replicated(mesh))}
    check_replica_consistency(tree)


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, n = pmesh.pad_to_multiple(x, 4)
    assert padded.shape == (8, 3)
    assert n == 5
    same, n2 = pmesh.pad_to_multiple(np.ones((8, 3)), 4)
    assert same.shape == (8, 3)


@pytest.mark.slow
def test_hybrid_mesh_walk_matches_single_device():
    """2-slice ('dcn','data') hybrid mesh (multi-slice pod topology,
    SURVEY §2.6): batch sharded over BOTH axes must reproduce the
    unsharded walk (round-3 VERDICT #6)."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=16, manifold_items=8, w_lpips=0.0)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch_size=8)

    img_single, ws_single, _ = jax.jit(fns.walk)(bundle, w0, crop_pos,
                                                 synth_key)

    mesh = pmesh.get_hybrid_mesh(2)  # 2 x 4
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    walk = jax.jit(fns.walk, in_shardings=(repl, batch, repl, repl),
                   out_shardings=(batch, batch, repl))
    img_h, ws_h, _ = walk(jax.device_put(bundle, repl),
                          jax.device_put(w0, batch), crop_pos, synth_key)
    np.testing.assert_allclose(np.asarray(img_single), np.asarray(img_h),
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ws_single), np.asarray(ws_h),
                               rtol=1e-2, atol=2e-3)
