"""Synthetic benchmark/dry-run harness: production compute graph, no datasets.

Builds a real-size StyleGAN2 G/D + LPIPS VGG with seeded random weights
and synthetic manifold summaries, then returns the exact jitted latent
walk the LatentAugment engine runs — for throughput benchmarking
(bench.py) and the multichip compile dry-run (__graft_entry__.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .augments import engine as engine_mod
from .augments import losses, manifold
from .models import vgg
from .models.stylegan2 import networks


def build_synthetic_setup(res=256, img_channels=2, channel_base=32768,
                          channel_max=512, num_epochs=10, opt_lr=0.01,
                          crop_size=64, w_pix=0.1, w_lpips=10.0,
                          w_latent=0.001, w_disc=0.01, manifold_items=64,
                          num_fp16_res=4, remat=None, seed=0):
    """Returns (fns, bundle, g_cfg) — un-jitted walk fns (taking the bundle
    as first arg) plus the device-state bundle on synthetic weights.

    Defaults mirror the reference's tuned operating point
    (backbone_latentaug.py:46-54): w_lpips=10, w_pix=0.1,
    w_latent=0.001, w_disc=0.01, 256x256, 2 modalities.
    """
    key = jax.random.PRNGKey(seed)
    kg, kd, kv, km = jax.random.split(key, 4)

    # bf16 on the top blocks (the reference trains its 256² models with
    # num_fp16_res=4); halves the walk's HBM footprint and feeds the MXU
    # at its native precision.
    g_cfg = networks.generator_config(
        img_resolution=res, img_channels=img_channels,
        channel_base=channel_base, channel_max=channel_max,
        num_fp16_res=(num_fp16_res if res >= 64 else 0))
    d_cfg = networks.discriminator_config(
        img_resolution=res, img_channels=img_channels,
        channel_base=channel_base, channel_max=channel_max,
        mbstd_group_size=4, num_fp16_res=(num_fp16_res if res >= 64 else 0))
    g_params = networks.generator_init(kg, g_cfg)
    d_params = networks.discriminator_init(kd, d_cfg)
    vgg_params = vgg.init_vgg(kv) if w_lpips > 0 else None

    # Synthetic manifold summaries with the right shapes.
    cc = manifold.center_crop_size(res)
    W_summary = None
    if w_latent > 0:
        W = jax.random.normal(jax.random.fold_in(km, 0),
                              (manifold_items, g_cfg.num_ws, g_cfg.w_dim)) * 0.1
        W_summary = losses.manifold_summary(W)
    X_cc_summaries = None
    if w_pix > 0:
        X_cc_summaries = []
        for m in range(img_channels):
            X = jax.random.uniform(jax.random.fold_in(km, 10 + m),
                                   (manifold_items, 1, cc, cc), minval=-1.0,
                                   maxval=1.0)
            X_cc_summaries.append(losses.manifold_summary(X))
    fea_summaries = None
    if w_lpips > 0:
        # Feature dim from a probe pass.
        probe = jnp.zeros((1, 3, crop_size, crop_size))
        fdim = vgg.lpips_features(vgg_params, probe).shape[1]
        fea_summaries = []
        for m in range(img_channels):
            F = jax.random.normal(jax.random.fold_in(km, 20 + m),
                                  (manifold_items, fdim)) * 0.01
            fea_summaries.append(losses.manifold_summary(F))

    if remat is None:
        # bf16 activations fit unchecked in HBM at batch 32/256²; fp32 needs
        # block remat. Measured: no-remat is ~27% faster when it fits.
        remat = g_cfg.num_fp16_res == 0
    fns = engine_mod.make_walk_fns(
        g_cfg, d_cfg,
        n_modes=img_channels, w_pix=w_pix, w_lpips=w_lpips,
        w_latent=w_latent, w_disc=w_disc,
        num_epochs=num_epochs, opt_lr=opt_lr, crop_size=crop_size,
        remat=remat)
    bundle = engine_mod.make_bundle(
        g_params, d_params, vgg_params, W_summary=W_summary,
        X_cc_summaries=X_cc_summaries, fea_summaries=fea_summaries)
    return fns, bundle, g_cfg


def example_walk_args(g_cfg, batch_size, seed=0):
    key = jax.random.PRNGKey(seed)
    w0 = jax.random.normal(key, (batch_size, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([3, 5], dtype=jnp.int32)
    synth_key = jax.random.PRNGKey(seed + 1)
    return w0, crop_pos, synth_key
