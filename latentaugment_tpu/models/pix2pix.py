"""Downstream pix2pix-style paired-translation model (U-Net G + PatchGAN D).

The reference frames LatentAugment as augmentation FOR a pix2pix-style
image-to-image consumer (README.md:66-86; the `backbone.py:28-31` loop
is an unfinished template calling `model.set_input/optimize_parameters`
on a model that is never defined). This module supplies that missing
consumer as a TPU-native trainer: pytree params + pure apply functions
(same idiom as models/stylegan2/networks.py), one jitted train step
(both optimizers inside), batch-shardable over a data mesh.

Architecture follows Isola et al. pix2pix: U-Net generator with skip
connections, 70x70-style PatchGAN discriminator, LSGAN adversarial loss
+ lambda * L1. Kept norm-free (lrelu convs) so one program serves any
resolution >= 2**depth without recompiling per-stat shapes.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.util_easydict import EasyDict


def pix2pix_config(in_channels=1, out_channels=1, base_channels=32,
                   depth=3, d_layers=3, lambda_l1=100.0, lr=2e-4,
                   beta1=0.5):
    return EasyDict(in_channels=in_channels, out_channels=out_channels,
                    base_channels=base_channels, depth=depth,
                    d_layers=d_layers, lambda_l1=float(lambda_l1),
                    lr=float(lr), beta1=float(beta1))


def _conv_init(key, in_ch, out_ch, k):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (out_ch, in_ch, k, k), jnp.float32) \
        * 0.02
    return {"w": w, "b": jnp.zeros((out_ch,), jnp.float32)}


def _conv(p, x, stride=1, padding=1):
    y = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


# ----------------------------------------------------------------------------
# U-Net generator


def generator_init(key, cfg):
    ch = [cfg.base_channels * (2 ** i) for i in range(cfg.depth)]
    params = {"enc": [], "dec": []}
    keys = jax.random.split(key, 2 * cfg.depth + 2)
    prev = cfg.in_channels
    for i in range(cfg.depth):
        params["enc"].append(_conv_init(keys[i], prev, ch[i], 4))
        prev = ch[i]
    params["mid"] = _conv_init(keys[cfg.depth], prev, prev, 3)
    for i in reversed(range(cfg.depth)):
        skip_ch = ch[i]
        out_ch = ch[i - 1] if i > 0 else cfg.base_channels
        params["dec"].append(
            _conv_init(keys[cfg.depth + 1 + (cfg.depth - 1 - i)],
                       prev + skip_ch, out_ch, 3))
        prev = out_ch
    params["out"] = _conv_init(keys[-1], prev, cfg.out_channels, 3)
    return params


def generator_apply(params, cfg, x):
    """x [N, in_ch, H, W] in [-1,1] -> y [N, out_ch, H, W] in (-1,1)."""
    skips = []
    h = x
    for p in params["enc"]:
        h = _lrelu(_conv(p, h, stride=2, padding=1))  # H -> H/2
        skips.append(h)
    h = _lrelu(_conv(params["mid"], h))
    for p in params["dec"]:
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=1)
        n, c, hh, ww = h.shape
        h = jax.image.resize(h, (n, c, hh * 2, ww * 2), "nearest")
        h = _lrelu(_conv(p, h))
    return jnp.tanh(_conv(params["out"], h))


# ----------------------------------------------------------------------------
# PatchGAN discriminator (conditional: sees A concat B)


def discriminator_init(key, cfg):
    ch = cfg.base_channels
    layers = []
    keys = jax.random.split(key, cfg.d_layers + 1)
    prev = cfg.in_channels + cfg.out_channels
    for i in range(cfg.d_layers):
        out = ch * (2 ** i)
        layers.append(_conv_init(keys[i], prev, out, 4))
        prev = out
    return {"layers": layers, "out": _conv_init(keys[-1], prev, 1, 4)}


def discriminator_apply(params, cfg, a, b):
    """Patch logits map for the (condition, image) pair."""
    h = jnp.concatenate([a, b], axis=1)
    for p in params["layers"]:
        h = _lrelu(_conv(p, h, stride=2, padding=1))
    return _conv(params["out"], h, stride=1, padding=1)


# ----------------------------------------------------------------------------
# Training step (LSGAN + L1), both updates in one jitted program


def init_all(key, cfg):
    kg, kd = jax.random.split(key)
    return {"G": generator_init(kg, cfg), "D": discriminator_init(kd, cfg)}


def _adam_init(params):
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {"m": zeros, "v": zeros, "t": jnp.zeros((), jnp.int32)}


def _adam_update(params, grads, state, lr, beta1, beta2=0.999, eps=1e-8):
    t = state["t"] + 1
    m = jax.tree_util.tree_map(
        lambda m_, g: beta1 * m_ + (1 - beta1) * g, state["m"], grads)
    v = jax.tree_util.tree_map(
        lambda v_, g: beta2 * v_ + (1 - beta2) * g * g, state["v"], grads)
    tf = t.astype(jnp.float32)
    scale = lr * jnp.sqrt(1 - beta2 ** tf) / (1 - beta1 ** tf)
    new_params = jax.tree_util.tree_map(
        lambda p, m_, v_: p - scale * m_ / (jnp.sqrt(v_) + eps),
        params, m, v)
    return new_params, {"m": m, "v": v, "t": t}


def opt_init(params):
    return {"G": _adam_init(params["G"]), "D": _adam_init(params["D"])}


def _mse(x, target):
    return jnp.mean((x - target) ** 2)


def make_train_step(cfg):
    """Build the jitted pix2pix update. cfg is baked in at trace time
    (builder pattern, as engine.make_walk_fns does); params/opt_state/
    batch are traced arguments, so the program shards over a batch mesh
    with a NamedSharding on a/b."""
    return jax.jit(functools.partial(_train_step, cfg))


def _train_step(cfg, params, opt_state, a, b):
    def d_loss_fn(d_params):
        fake = generator_apply(params["G"], cfg, a)
        real_logits = discriminator_apply(d_params, cfg, a, b)
        fake_logits = discriminator_apply(d_params, cfg, a,
                                          lax.stop_gradient(fake))
        return 0.5 * (_mse(real_logits, 1.0) + _mse(fake_logits, 0.0))

    def g_loss_fn(g_params):
        fake = generator_apply(g_params, cfg, a)
        fake_logits = discriminator_apply(params["D"], cfg, a, fake)
        l1 = jnp.mean(jnp.abs(fake - b))
        return _mse(fake_logits, 1.0) + cfg.lambda_l1 * l1, l1

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(params["D"])
    (g_loss, l1), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        params["G"])

    new_d, d_state = _adam_update(params["D"], d_grads, opt_state["D"],
                                  cfg.lr, cfg.beta1)
    new_g, g_state = _adam_update(params["G"], g_grads, opt_state["G"],
                                  cfg.lr, cfg.beta1)
    return ({"G": new_g, "D": new_d}, {"G": g_state, "D": d_state},
            {"loss_G": g_loss, "loss_D": d_loss, "loss_L1": l1})


def count_params(params):
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(params)))
