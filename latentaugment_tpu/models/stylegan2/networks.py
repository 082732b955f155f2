"""StyleGAN2 Generator + Discriminator, functional JAX.

The reference ships these architectures *inside* the network pickle via
the persistence source-embedding mechanism (SURVEY.md §1 note;
reference torch_utils/persistence.py:35-130) — a JAX framework cannot
execute embedded torch source, so the full architecture is implemented
here: mapping MLP (lrelu, lr_multiplier 0.01, w_avg truncation),
modulated-conv synthesis blocks with noise/toRGB/skip and FIR
resampling, and the resnet discriminator with minibatch-stddev epilogue.

Design:
  * Parameters live in nested dicts whose joined path equals the torch
    state-dict key (`synthesis.b4.conv1.weight`), so converting a real
    NVIDIA checkpoint is a mechanical tree rebuild (see convert.py).
  * Everything is a pure function of (params, inputs) — jit/vmap/pjit
    compose freely, and the latent-walk engine differentiates through
    `synthesis_apply` w.r.t. the w codes only.
  * Convs run through ops.modulated_conv2d / ops.conv2d_resample, whose
    defaults map the whole network onto big MXU matmuls (input-scaling
    modulation, one shared-weight conv per layer for the batch).
  * Optional bf16 for high-resolution blocks (num_fp16_res knob of the
    reference maps to bfloat16 on TPU — no loss-scaling needed).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bias_act, conv2d_resample, modulated_conv2d, setup_filter, upsample2d
from ...ops.bias_act import activation_funcs
from ...utils.util_easydict import EasyDict


# ----------------------------------------------------------------------------
# Config

def generator_config(z_dim=512, c_dim=0, w_dim=512, img_resolution=256,
                     img_channels=2, channel_base=32768, channel_max=512,
                     num_mapping_layers=8, conv_clamp=256, num_fp16_res=0,
                     mapping_lr_multiplier=0.01, embed_features=None):
    # Conditional G: class labels enter through a linear embed whose output
    # is 2nd-moment-normalized and concatenated with normalized z (the
    # pickle-embedded MappingNetwork contract; SURVEY §1 note). Default
    # embed width = w_dim, 0 when unconditional.
    if embed_features is None:
        embed_features = w_dim if c_dim > 0 else 0
    cfg = EasyDict(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                   img_resolution=img_resolution, img_channels=img_channels,
                   channel_base=channel_base, channel_max=channel_max,
                   num_mapping_layers=num_mapping_layers, conv_clamp=conv_clamp,
                   num_fp16_res=num_fp16_res,
                   mapping_lr_multiplier=mapping_lr_multiplier,
                   embed_features=embed_features)
    cfg.block_resolutions = [2 ** i for i in range(2, int(math.log2(img_resolution)) + 1)]
    cfg.channels = {res: min(channel_base // res, channel_max) for res in cfg.block_resolutions}
    # num_ws: one w per conv, plus one for the final toRGB.
    num_ws = 0
    for res in cfg.block_resolutions:
        num_ws += 1 if res == 4 else 2
    cfg.num_ws = num_ws + 1
    return cfg


def discriminator_config(c_dim=0, img_resolution=256, img_channels=2,
                         channel_base=32768, channel_max=512, conv_clamp=256,
                         num_fp16_res=0, mbstd_group_size=4, mbstd_num_channels=1,
                         cmap_dim=None, num_mapping_layers=8,
                         mapping_lr_multiplier=0.01):
    cfg = EasyDict(c_dim=c_dim, img_resolution=img_resolution,
                   img_channels=img_channels, channel_base=channel_base,
                   channel_max=channel_max, conv_clamp=conv_clamp,
                   num_fp16_res=num_fp16_res, mbstd_group_size=mbstd_group_size,
                   mbstd_num_channels=mbstd_num_channels,
                   num_mapping_layers=num_mapping_layers,
                   mapping_lr_multiplier=mapping_lr_multiplier)
    cfg.block_resolutions = [2 ** i for i in range(int(math.log2(img_resolution)), 2, -1)]
    cfg.channels = {res: min(channel_base // res, channel_max)
                    for res in cfg.block_resolutions + [4]}
    # Conditional D: the epilogue's 'out' FC widens to cmap_dim and the
    # logit is the projection <out, mapping(c)> / sqrt(cmap_dim).
    if cmap_dim is None:
        cmap_dim = cfg.channels[4] if c_dim > 0 else 0
    cfg.cmap_dim = cmap_dim
    return cfg


def _cmap_mapping_cfg(cfg):
    """Config for D's label-mapping network: the pickle-embedded contract is
    MappingNetwork(z_dim=0, c_dim, w_dim=cmap_dim) — embed + 8 FC layers,
    no w_avg, no broadcast."""
    return EasyDict(z_dim=0, c_dim=cfg.c_dim, w_dim=cfg.cmap_dim,
                    num_mapping_layers=cfg.num_mapping_layers,
                    mapping_lr_multiplier=cfg.mapping_lr_multiplier,
                    embed_features=cfg.cmap_dim, num_ws=0)


# ----------------------------------------------------------------------------
# Layer primitives (init + apply pairs)

def _fc_init(key, in_features, out_features, bias=True, bias_init=0.0,
             lr_multiplier=1.0):
    """FullyConnectedLayer init. The stored weight is randn/lr_multiplier
    (and bias bias_init/lr_multiplier): fc_apply multiplies by
    lr_multiplier at runtime, so the EFFECTIVE init std is 1/sqrt(in)
    regardless of lr_multiplier — the pickle-embedded FullyConnectedLayer
    contract. Without the division, an 8-layer 0.01-lr mapping collapses
    random-init activations by 100x per layer (~1e-16 at the output)."""
    w = jax.random.normal(key, (out_features, in_features),
                          dtype=jnp.float32) / lr_multiplier
    p = {'weight': w}
    if bias:
        p['bias'] = jnp.full((out_features,),
                             float(bias_init) / lr_multiplier,
                             dtype=jnp.float32)
    return p


def fc_apply(p, x, activation='linear', lr_multiplier=1.0):
    """FullyConnectedLayer: equalized-lr linear + bias_act."""
    in_features = p['weight'].shape[1]
    # float(): np scalars are strongly typed and would promote bf16 -> f32.
    w = p['weight'].astype(x.dtype) * float(lr_multiplier / np.sqrt(in_features))
    x = x @ w.T
    b = p.get('bias')
    if b is not None:
        b = b.astype(x.dtype) * lr_multiplier
    return bias_act(x, b, act=activation)


def _conv_init(key, in_channels, out_channels, kernel_size, bias=True):
    w = jax.random.normal(key, (out_channels, in_channels, kernel_size, kernel_size),
                          dtype=jnp.float32)
    p = {'weight': w}
    if bias:
        p['bias'] = jnp.zeros((out_channels,), dtype=jnp.float32)
    return p


def conv_apply(p, x, f=None, up=1, down=1, activation='linear', gain=1.0,
               conv_clamp=None):
    """Conv2dLayer: equalized-lr conv with optional resampling + bias_act."""
    out_ch, in_ch, kh, kw = p['weight'].shape
    w = p['weight'].astype(x.dtype) * float(1.0 / np.sqrt(in_ch * kh * kw))
    flip_weight = (up == 1)
    x = conv2d_resample(x, w, f=f, up=up, down=down, padding=kh // 2,
                        flip_weight=flip_weight)
    act_gain = float(activation_funcs[activation].def_gain) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    b = p.get('bias')
    b = b.astype(x.dtype) if b is not None else None
    return bias_act(x, b, act=activation, gain=act_gain, clamp=act_clamp)


# ----------------------------------------------------------------------------
# Mapping network

def mapping_init(key, cfg, with_w_avg=True):
    keys = jax.random.split(key, cfg.num_mapping_layers + 2)
    p = {}
    embed_features = int(cfg.get('embed_features', 0) or 0)
    features = [cfg.z_dim + embed_features] + [cfg.w_dim] * cfg.num_mapping_layers
    for i in range(cfg.num_mapping_layers):
        p[f'fc{i}'] = _fc_init(keys[i], features[i], features[i + 1],
                               lr_multiplier=cfg.mapping_lr_multiplier)
    if cfg.c_dim > 0:
        # Label embed: plain FC (lr_mult 1, unlike the 0.01 mapping FCs).
        p['embed'] = _fc_init(keys[cfg.num_mapping_layers], cfg.c_dim,
                              embed_features)
    if with_w_avg:
        p['w_avg'] = jnp.zeros((cfg.w_dim,), dtype=jnp.float32)
    return p


def _normalize_2nd_moment(x):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-8)


def mapping_apply(params, cfg, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                  broadcast=True):
    """z (and one-hot c when c_dim > 0) -> w (+ optional truncation toward
    w_avg, + broadcast to num_ws)."""
    x = None
    if cfg.z_dim > 0:
        x = _normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0:
        assert c is not None, "c_dim > 0 requires labels c [N, c_dim]"
        y = _normalize_2nd_moment(
            fc_apply(params['embed'], c.astype(jnp.float32)))
        x = y if x is None else jnp.concatenate([x, y], axis=1)
    for i in range(cfg.num_mapping_layers):
        x = fc_apply(params[f'fc{i}'], x, activation='lrelu',
                     lr_multiplier=cfg.mapping_lr_multiplier)
    if truncation_psi != 1.0:
        w_avg = params['w_avg']
        if truncation_cutoff is None or not broadcast:
            x = w_avg + truncation_psi * (x - w_avg)
    if broadcast:
        x = jnp.repeat(x[:, None, :], cfg.num_ws, axis=1)
        if truncation_psi != 1.0 and truncation_cutoff is not None:
            w_avg = params['w_avg']
            trunc = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
            x = x.at[:, :truncation_cutoff].set(trunc)
    return x


# ----------------------------------------------------------------------------
# Synthesis network

def _synthesis_layer_init(key, in_ch, out_ch, w_dim, resolution, kernel_size=3):
    k1, k2 = jax.random.split(key)
    p = {
        'affine': _fc_init(k1, w_dim, in_ch, bias_init=1.0),
        'weight': jax.random.normal(k2, (out_ch, in_ch, kernel_size, kernel_size),
                                    dtype=jnp.float32),
        'bias': jnp.zeros((out_ch,), dtype=jnp.float32),
        'noise_const': jax.random.normal(jax.random.fold_in(key, 7),
                                         (resolution, resolution), dtype=jnp.float32),
        'noise_strength': jnp.zeros((), dtype=jnp.float32),
    }
    return p


def synthesis_layer_apply(p, cfg, x, w, f, up=1, noise_mode='const', gain=1.0,
                          rng=None):
    """Modulated conv + noise + lrelu. noise_mode: 'const'|'random'|'none'."""
    styles = fc_apply(p['affine'], w)
    noise = None
    if noise_mode == 'const':
        noise = p['noise_const'].astype(x.dtype) * p['noise_strength'].astype(x.dtype)
    elif noise_mode == 'random':
        assert rng is not None
        res = p['noise_const'].shape[0]
        noise = (jax.random.normal(rng, (x.shape[0], 1, res, res), dtype=x.dtype)
                 * p['noise_strength'].astype(x.dtype))
    flip_weight = (up == 1)
    kh = p['weight'].shape[-1]
    x = modulated_conv2d(x, p['weight'].astype(x.dtype), styles, noise=noise,
                         up=up, padding=kh // 2, resample_filter=f,
                         flip_weight=flip_weight)
    act_gain = float(activation_funcs['lrelu'].def_gain) * gain
    act_clamp = cfg.conv_clamp * gain if cfg.conv_clamp is not None else None
    return bias_act(x, p['bias'].astype(x.dtype), act='lrelu', gain=act_gain,
                    clamp=act_clamp)


def _torgb_init(key, in_ch, out_ch, w_dim):
    k1, k2 = jax.random.split(key)
    return {
        'affine': _fc_init(k1, w_dim, in_ch, bias_init=1.0),
        'weight': jax.random.normal(k2, (out_ch, in_ch, 1, 1), dtype=jnp.float32),
        'bias': jnp.zeros((out_ch,), dtype=jnp.float32),
    }


def torgb_apply(p, cfg, x, w):
    in_ch = p['weight'].shape[1]
    styles = fc_apply(p['affine'], w) * float(1.0 / np.sqrt(in_ch))
    x = modulated_conv2d(x, p['weight'].astype(x.dtype), styles, demodulate=False)
    return bias_act(x, p['bias'].astype(x.dtype), clamp=cfg.conv_clamp)


def synthesis_init(key, cfg):
    """Init the full synthesis trunk. Layout mirrors torch names:
    params['b<res>'] = {'const'?, 'conv0'?, 'conv1', 'torgb', 'resample_filter'}."""
    p = {}
    for i, res in enumerate(cfg.block_resolutions):
        bkey = jax.random.fold_in(key, res)
        in_ch = cfg.channels[res // 2] if res > 4 else 0
        out_ch = cfg.channels[res]
        block = {}
        if res == 4:
            block['const'] = jax.random.normal(jax.random.fold_in(bkey, 0),
                                               (out_ch, 4, 4), dtype=jnp.float32)
        else:
            block['conv0'] = _synthesis_layer_init(jax.random.fold_in(bkey, 1),
                                                   in_ch, out_ch, cfg.w_dim, res)
        block['conv1'] = _synthesis_layer_init(jax.random.fold_in(bkey, 2),
                                               out_ch, out_ch, cfg.w_dim, res)
        block['torgb'] = _torgb_init(jax.random.fold_in(bkey, 3), out_ch,
                                     cfg.img_channels, cfg.w_dim)
        p[f'b{res}'] = block
    p['resample_filter'] = setup_filter([1, 3, 3, 1], separable=True)
    return p


def synthesis_apply(params, cfg, ws, noise_mode='const', rng=None, remat=False):
    """ws [N, num_ws, w_dim] -> image [N, img_channels, res, res] (skip arch).

    remat checkpoints blocks: the backward pass recomputes their
    activations instead of storing them — needed to keep the K-step
    walk's gradient inside a single chip's HBM at batch 32 (unchecked,
    the fp32 256² fwd+bwd residuals alone exceed 16 GB). remat may be
    bool (all blocks) or an int: remat only blocks with res >= that.
    """
    f = params['resample_filter']
    n = ws.shape[0]

    def want_remat(res):
        if isinstance(remat, bool):
            return remat
        return res >= int(remat)
    # bf16 for the largest blocks when requested (reference num_fp16_res).
    fp16_resolutions = set()
    if cfg.num_fp16_res > 0:
        fp16_resolutions = set(cfg.block_resolutions[-cfg.num_fp16_res:])

    def block_fn(res, dtype, first):
        def apply(block, f, x, ws_block, rngs):
            w_idx = 0
            if first:
                x = jnp.broadcast_to(block['const'][None],
                                     (n,) + block['const'].shape)
                x = x.astype(dtype)
            else:
                x = x.astype(dtype)
                x = synthesis_layer_apply(block['conv0'], cfg, x,
                                          ws_block[:, 0], f, up=2,
                                          noise_mode=noise_mode,
                                          rng=(rngs[0] if rngs is not None else None))
                w_idx = 1
            x = synthesis_layer_apply(block['conv1'], cfg, x,
                                      ws_block[:, w_idx], f,
                                      noise_mode=noise_mode,
                                      rng=(rngs[1] if rngs is not None else None))
            y = torgb_apply(block['torgb'], cfg, x.astype(jnp.float32),
                            ws_block[:, w_idx + 1])
            return x, y
        return jax.checkpoint(apply) if want_remat(res) else apply

    x = None
    img = None
    w_idx = 0
    key_iter = list(jax.random.split(rng, 2 * len(cfg.block_resolutions))) \
        if rng is not None else None
    for bi, res in enumerate(cfg.block_resolutions):
        block = params[f'b{res}']
        dtype = jnp.bfloat16 if res in fp16_resolutions else jnp.float32
        first = (res == 4)
        n_conv = 1 if first else 2
        # ws slice covering this block's convs + its torgb (next w).
        ws_block = ws[:, w_idx:w_idx + n_conv + 1]
        rngs = (jnp.stack(key_iter[2 * bi:2 * bi + 2])
                if key_iter is not None else None)
        x, y = block_fn(res, dtype, first)(block, f, x if x is not None
                                           else jnp.zeros((), jnp.float32),
                                           ws_block, rngs)
        w_idx += n_conv
        if img is not None:
            img = upsample2d(img, f, up=2)
        img = y if img is None else img + y
    return img


# ----------------------------------------------------------------------------
# Generator facade

def generator_init(key, cfg):
    k1, k2 = jax.random.split(key)
    return {'mapping': mapping_init(k1, cfg), 'synthesis': synthesis_init(k2, cfg)}


def generator_apply(params, cfg, z, c=None, truncation_psi=1.0, noise_mode='const',
                    rng=None):
    ws = mapping_apply(params['mapping'], cfg, z, c, truncation_psi=truncation_psi)
    return synthesis_apply(params['synthesis'], cfg, ws, noise_mode=noise_mode, rng=rng)


# ----------------------------------------------------------------------------
# Discriminator

def _disc_block_init(key, in_ch, tmp_ch, out_ch, img_channels, first):
    p = {}
    if first:
        p['fromrgb'] = _conv_init(jax.random.fold_in(key, 0), img_channels, tmp_ch, 1)
    p['conv0'] = _conv_init(jax.random.fold_in(key, 1), tmp_ch, tmp_ch, 3)
    p['conv1'] = _conv_init(jax.random.fold_in(key, 2), tmp_ch, out_ch, 3)
    p['skip'] = _conv_init(jax.random.fold_in(key, 3), tmp_ch, out_ch, 1, bias=False)
    return p


def _disc_block_apply(p, cfg, x, img, f, first):
    """Resnet D block: (fromRGB +) conv0 -> down-conv1, + down-skip."""
    if first:
        x = conv_apply(p['fromrgb'], img, activation='lrelu',
                       conv_clamp=cfg.conv_clamp)
    y = conv_apply(p['skip'], x, f=f, down=2, gain=np.sqrt(0.5))
    x = conv_apply(p['conv0'], x, activation='lrelu', conv_clamp=cfg.conv_clamp)
    x = conv_apply(p['conv1'], x, f=f, down=2, activation='lrelu',
                   gain=np.sqrt(0.5), conv_clamp=cfg.conv_clamp)
    return y + x


def minibatch_stddev(x, group_size, num_channels):
    """Append per-group feature-stddev channels (D epilogue)."""
    n, c, h, w = x.shape
    g = min(group_size, n) if group_size is not None else n
    assert n % g == 0, f"batch {n} not divisible by mbstd group {g}"
    f_ = num_channels
    cc = c // f_
    y = x.reshape(g, n // g, f_, cc, h, w).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))  # [n//g, F]
    y = y.reshape(n // g, f_, 1, 1).astype(x.dtype)
    y = jnp.tile(y, (g, 1, h, w))
    return jnp.concatenate([x, y], axis=1)


def discriminator_init(key, cfg):
    p = {}
    first = True
    for res in cfg.block_resolutions:
        in_ch = cfg.channels[res] if not first else 0
        tmp_ch = cfg.channels[res]
        out_ch = cfg.channels[res // 2]
        p[f'b{res}'] = _disc_block_init(jax.random.fold_in(key, res), in_ch,
                                        tmp_ch, out_ch, cfg.img_channels, first)
        first = False
    ch4 = cfg.channels[4]
    cmap_dim = int(cfg.get('cmap_dim', 0) or 0)
    ep = {
        'conv': _conv_init(jax.random.fold_in(key, 1), ch4 + cfg.mbstd_num_channels, ch4, 3),
        'fc': _fc_init(jax.random.fold_in(key, 2), ch4 * 4 * 4, ch4),
        'out': _fc_init(jax.random.fold_in(key, 3), ch4,
                        1 if cmap_dim == 0 else cmap_dim),
    }
    p['b4'] = ep
    if cfg.c_dim > 0:
        p['mapping'] = mapping_init(jax.random.fold_in(key, 4),
                                    _cmap_mapping_cfg(cfg), with_w_avg=False)
    p['resample_filter'] = setup_filter([1, 3, 3, 1], separable=True)
    return p


def discriminator_apply(params, cfg, img, c=None, remat=False):
    """img [N, C, res, res] -> logits [N, 1]. remat: checkpoint blocks
    (bool = all, int = only blocks with res >= remat; see
    synthesis_apply). num_fp16_res > 0 runs the highest-resolution
    blocks in bfloat16."""
    f = params['resample_filter']

    def want_remat(res):
        if isinstance(remat, bool):
            return remat
        return res >= int(remat)
    fp16_resolutions = set()
    if cfg.num_fp16_res > 0:
        fp16_resolutions = set(
            sorted(cfg.block_resolutions)[-cfg.num_fp16_res:])
    x = None
    first = True
    for res in cfg.block_resolutions:
        dtype = jnp.bfloat16 if res in fp16_resolutions else jnp.float32

        def fn(block, f, x, img, first=first, dtype=dtype):
            if first:
                img = img.astype(dtype)
            else:
                x = x.astype(dtype)
            return _disc_block_apply(block, cfg, x, img, f, first)

        if want_remat(res):
            fn = jax.checkpoint(fn)
        x = fn(params[f'b{res}'], f,
               x if x is not None else jnp.zeros((), jnp.float32), img)
        first = False
    x = x.astype(jnp.float32)
    # Epilogue at 4x4.
    ep = params['b4']
    x = minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    x = conv_apply(ep['conv'], x, activation='lrelu', conv_clamp=cfg.conv_clamp)
    x = x.reshape(x.shape[0], -1)
    x = fc_apply(ep['fc'], x, activation='lrelu')
    x = fc_apply(ep['out'], x)
    if cfg.c_dim > 0:
        # Projection discriminator: logit = <out, mapping(c)> / sqrt(cmap_dim)
        # (pickle-embedded DiscriminatorEpilogue contract).
        cmap = mapping_apply(params['mapping'], _cmap_mapping_cfg(cfg),
                             None, c, broadcast=False)
        x = jnp.sum(x * cmap, axis=1, keepdims=True) \
            * float(1.0 / np.sqrt(cfg.cmap_dim))
    return x
