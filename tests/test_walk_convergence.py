"""Optimization-direction tests: the walk must move the objective the
intended way (sign conventions of util_latent_aug.py:270)."""

import numpy as np

import jax

from latentaugment_tpu import benchmark
import pytest


@pytest.mark.slow
def test_walk_total_loss_decreases():
    """The Adam walk minimizes (-latent - pix - lpips + disc)."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=8, crop_size=16,
        manifold_items=8)
    walk = jax.jit(fns.walk)
    w0, crop_pos, key = benchmark.example_walk_args(g_cfg, 4)
    _, _, traces = walk(bundle, w0, crop_pos, key)
    losses = np.asarray(traces["loss"])
    assert losses.shape == (8,)
    assert losses[-1] < losses[0], f"walk did not descend: {losses}"


def test_walk_diversity_terms_increase():
    """Diversity terms (latent/pix distance to manifold) should grow —
    they enter the total with negative sign."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=8, crop_size=16,
        manifold_items=8, w_lpips=0.0, w_disc=0.0, w_pix=0.5, w_latent=0.05)
    walk = jax.jit(fns.walk)
    w0, crop_pos, key = benchmark.example_walk_args(g_cfg, 4)
    _, _, traces = walk(bundle, w0, crop_pos, key)
    lat = np.asarray(traces["loss_latent"])
    pix = np.asarray(traces["loss_pix"])
    assert lat[-1] > lat[0], f"latent distance did not grow: {lat}"
    assert pix[-1] > pix[0], f"pixel distance did not grow: {pix}"


@pytest.mark.slow
def test_walk_disc_only_decreases_disc_loss():
    """With only the realism term, softplus(-D) should fall."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=10, crop_size=16,
        manifold_items=8, w_lpips=0.0, w_disc=1.0, w_pix=0.0, w_latent=0.0,
        opt_lr=0.02)
    walk = jax.jit(fns.walk)
    w0, crop_pos, key = benchmark.example_walk_args(g_cfg, 4)
    _, _, traces = walk(bundle, w0, crop_pos, key)
    disc = np.asarray(traces["loss_disc"])
    assert disc[-1] < disc[0], f"disc loss did not fall: {disc}"


def test_walk_rejects_per_layer_w():
    """The walk operates in flat W space: per-layer W+ input must fail at
    trace time with a clear message, not deep inside the manifold loss."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2, crop_size=16,
        manifold_items=8)
    walk = jax.jit(fns.walk)
    w0, crop_pos, key = benchmark.example_walk_args(g_cfg, 4)
    w_plus = np.repeat(np.asarray(w0), g_cfg.num_ws, axis=1)
    with pytest.raises(ValueError, match="flat W space"):
        walk(bundle, w_plus, crop_pos, key)
