"""Batched W-space projection (latent inversion) for StyleGAN2 on TPU.

The reference workflow REQUIRES per-image inverted latents but ships no
projector: its README (reference README.md:62-63) points users at the
external NVIDIA stylegan2-ada-pytorch ``projector.py``, whose per-slice
outputs are then packaged by ``data/write_tozip.py`` (reference
write_tozip.py:81 reads the ``temp-projector`` directory). This module
closes that gap natively: the same optimization semantics as NVIDIA's
projector (Adam on a single w, cosine lr ramp-down with warm-up, decaying
Gaussian w-noise for exploration, perceptual feature distance), rebuilt
TPU-first:

- The whole ``num_steps`` descent is ONE jitted ``lax.scan`` — no host
  sync per step (NVIDIA's loop is a Python ``for`` with per-step
  ``loss.backward()``).
- Projection is BATCHED over images (NVIDIA inverts one image at a
  time): every step is a big MXU-friendly G forward/backward over the
  batch, and the batch axis shards over a device mesh exactly like the
  walk (`scripts/project_dataset.py --n_devices`).
- The perceptual distance reuses the framework's LPIPS VGG16 embedding
  (``vgg.lpips_features``, [0,255] input — the same features the
  LatentAugment policy consumes), applied per modality on the
  channel-concat medical pairs.

Deliberate deviations from NVIDIA's projector, documented:
- No noise-buffer optimization: this G runs ``noise_mode='const'``
  (parity with the walk, engine.py), so there are no per-layer noise
  buffers to regularize. The reference explicitly allows any inversion
  procedure (README.md:63).
- Optional pixel-MSE term (``pix_weight``) for the medical 2-channel
  regime where VGG features (ImageNet-trained) underconstrain — off by
  default to match NVIDIA semantics.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import networks_for, vgg

from ...ops.adam import adam_step


def w_stats(mapping_params, g_cfg, key, n_samples=10000):
    """(w_avg [1,1,w_dim], w_std scalar) over mapped z~N(0,I).

    NVIDIA's projector seeds the descent at the mapping average and
    scales the exploration noise by the W-space spread: std is the
    root of the TOTAL squared deviation per sample (summed over w_dim,
    not per-coordinate). Conditional nets (c_dim>0) average over
    uniform one-hot labels.
    """
    zk, ck = jax.random.split(key)
    z = jax.random.normal(zk, (n_samples, g_cfg.z_dim))
    c = None
    if g_cfg.c_dim > 0:
        idx = jax.random.randint(ck, (n_samples,), 0, g_cfg.c_dim)
        c = jax.nn.one_hot(idx, g_cfg.c_dim)
    w = networks_for(g_cfg).mapping_apply(mapping_params, g_cfg, z, c=c,
                                          broadcast=False)  # [N, w_dim]
    w_avg = jnp.mean(w, axis=0)
    w_std = jnp.sqrt(jnp.sum(jnp.square(w - w_avg)) / n_samples)
    return w_avg.reshape(1, 1, -1), w_std


def make_project_fn(g_cfg, num_steps=1000, initial_lr=0.1,
                    initial_noise_factor=0.05, lr_rampdown_length=0.25,
                    lr_rampup_length=0.05, noise_ramp_length=0.75,
                    pix_weight=0.0, remat=False, checkpoint_feats=False):
    """Returns project(g_params, vgg_params, target, w_avg, w_std, key)
    -> (w_opt [B,1,w_dim], dists [num_steps]).

    target: [B, n_modes, res, res] in [-1, 1] (channel-concat pair, the
    policy's image convention). Pure and jittable; batch-shardable.
    """
    num_ws = g_cfg.num_ws
    n_modes = g_cfg.img_channels
    num_steps = int(num_steps)
    gnet = networks_for(g_cfg)

    def perceptual(vgg_params, x):
        # Fold modalities into the batch (one VGG pass, batch-major so a
        # batch-sharded mesh never reshards) — same trick as the walk's
        # term_lpips (engine.py).
        b = x.shape[0]
        xm = x.reshape(b * n_modes, 1, *x.shape[2:])
        xm = jnp.repeat(xm, 3, axis=1)
        feats = vgg.lpips_features(vgg_params, (xm + 1.0) * 127.5)
        return feats.reshape(b, -1)

    def project(g_params, vgg_params, target, w_avg, w_std, key):
        batch = target.shape[0]
        target_feats = perceptual(vgg_params, target)
        w0 = jnp.broadcast_to(
            w_avg.reshape(1, 1, -1).astype(jnp.float32),
            (batch, 1, w_avg.shape[-1])).astype(jnp.float32)
        step_keys = jax.random.split(key, num_steps)

        feat_fn = perceptual
        if checkpoint_feats:
            # Recompute the VGG activations in the backward pass instead
            # of storing them (the full-res feature stack dominates the
            # step's residuals at larger batches).
            feat_fn = jax.checkpoint(perceptual)

        def loss_fn(w, nk, t_frac):
            noise_scale = (w_std * initial_noise_factor
                           * jnp.square(jnp.maximum(
                               0.0, 1.0 - t_frac / noise_ramp_length)))
            wn = w + jax.random.normal(nk, w.shape) * noise_scale
            ws = jnp.repeat(wn, num_ws, axis=1)
            x = gnet.synthesis_apply(g_params["synthesis"], g_cfg, ws,
                                     noise_mode="const", remat=remat)
            f = feat_fn(vgg_params, x)
            dist = jnp.mean(jnp.sum(jnp.square(f - target_feats)
                                    .reshape(batch, -1), axis=-1))
            if pix_weight > 0.0:
                dist = dist + pix_weight * jnp.mean(jnp.square(x - target))
            return dist

        grad_fn = jax.value_and_grad(loss_fn)

        def step(carry, inp):
            w, m, v = carry
            t, nk = inp
            t_frac = t / num_steps
            # NVIDIA's schedule: cosine ramp-down over the final quarter,
            # linear warm-up over the first 5%.
            lr_ramp = jnp.minimum(1.0, (1.0 - t_frac) / lr_rampdown_length)
            lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * jnp.pi)
            lr_ramp = lr_ramp * jnp.minimum(1.0, t_frac / lr_rampup_length)
            lr = initial_lr * lr_ramp
            dist, g = grad_fn(w, nk, t_frac)
            w, m, v = adam_step(w, m, v, g, t, lr)
            return (w, m, v), dist

        init = (w0, jnp.zeros_like(w0), jnp.zeros_like(w0))
        ts = jnp.arange(num_steps, dtype=jnp.float32)
        (w_opt, _, _), dists = lax.scan(step, init, (ts, step_keys))
        return w_opt, dists

    return project


def broadcast_rows(w_opt, num_ws):
    """[B, 1, w_dim] -> list of [num_ws, w_dim] numpy arrays, the
    per-slice pickle payload the inversion zip stores (all rows equal, so
    the policy's reverse_broadcasting recovers w losslessly)."""
    w = np.asarray(w_opt, dtype=np.float32)
    return [np.repeat(w[i], num_ws, axis=0) for i in range(w.shape[0])]
