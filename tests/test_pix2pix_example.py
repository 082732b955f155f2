"""Downstream pix2pix consumer: model math + the worked example e2e.

Covers the loop the reference leaves unfinished (backbone.py:28-31
calls optimize_parameters on an undefined model; README.md:66-86 frames
LatentAugment as input to a pix2pix-style translator).
"""

import numpy as np

import jax
import jax.numpy as jnp

from latentaugment_tpu.models import pix2pix
import pytest


def test_shapes_and_param_count():
    cfg = pix2pix.pix2pix_config(base_channels=8, depth=2, d_layers=2)
    params = pix2pix.init_all(jax.random.PRNGKey(0), cfg)
    a = jnp.zeros((2, 1, 32, 32))
    y = pix2pix.generator_apply(params["G"], cfg, a)
    assert y.shape == (2, 1, 32, 32)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output
    logits = pix2pix.discriminator_apply(params["D"], cfg, a, y)
    assert logits.shape[0] == 2 and logits.shape[1] == 1
    assert logits.shape[2] < 32  # patch map, strided down
    assert pix2pix.count_params(params) > 1000


def test_train_step_learns_identity():
    """On A->A data the L1 term must fall: the G update direction is
    real (catches sign/transpose bugs in the fused two-optimizer step)."""
    cfg = pix2pix.pix2pix_config(base_channels=8, depth=2, d_layers=2,
                                 lambda_l1=100.0, lr=2e-3)
    params = pix2pix.init_all(jax.random.PRNGKey(0), cfg)
    opt_state = pix2pix.opt_init(params)
    step = pix2pix.make_train_step(cfg)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(4, 1, 16, 16).astype(np.float32) * 2 - 1)
    first = last = None
    for i in range(60):
        params, opt_state, metrics = step(params, opt_state, a, a)
        if i == 0:
            first = float(metrics["loss_L1"])
        last = float(metrics["loss_L1"])
    assert np.isfinite(last)
    # Measured trajectory: L1 0.503 -> 0.327 in 60 steps (monotone),
    # D loss 0.50 -> 0.006. Thresholds leave ~2x margin.
    assert last < 0.8 * first, (first, last)
    assert float(metrics["loss_D"]) < 0.1


def test_train_step_sharded_matches_single():
    """The jitted step runs unchanged over a batch mesh and produces the
    same params (GSPMD data parallelism, no code changes)."""
    from latentaugment_tpu.parallel import mesh as pmesh

    cpu_mesh_8 = pmesh.get_mesh(8)

    cfg = pix2pix.pix2pix_config(base_channels=8, depth=2, d_layers=2)
    params = pix2pix.init_all(jax.random.PRNGKey(0), cfg)
    opt_state = pix2pix.opt_init(params)
    step = pix2pix.make_train_step(cfg)
    rng = np.random.RandomState(1)
    a = rng.rand(8, 1, 16, 16).astype(np.float32)
    b = rng.rand(8, 1, 16, 16).astype(np.float32)

    p1, _, m1 = step(params, opt_state, jnp.asarray(a), jnp.asarray(b))

    mesh = cpu_mesh_8
    sh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    p2, _, m2 = step(jax.device_put(params, repl),
                     jax.device_put(opt_state, repl),
                     jax.device_put(jnp.asarray(a), sh),
                     jax.device_put(jnp.asarray(b), sh))
    np.testing.assert_allclose(float(m1["loss_G"]), float(m2["loss_G"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for x, y in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_example_runs_end_to_end(tmp_path):
    """The worked example trains on real LatentAugment output."""
    import examples.train_pix2pix as ex

    argv = ex.build_argv_synthetic(str(tmp_path)) + ["--pix2pix_steps", "3"]
    params = ex.main(argv)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
