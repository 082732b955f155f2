"""Alias-free (StyleGAN3) generator, functional JAX.

The reference executes SG3 architectures from pickle-embedded torch
source (torch_utils/persistence.py:35-130 — the runtime it vendors IS
the StyleGAN3 repo's, so its users can load alias-free checkpoints);
a JAX framework cannot execute embedded source, so the family is
implemented natively here, same idioms as ../stylegan2/networks.py:

  * params are nested dicts whose joined path equals the torch
    state-dict key (`synthesis.L2_52_512.affine.weight`), so ingesting
    a real checkpoint is a mechanical tree rebuild (see convert.py);
  * everything is a pure function of (params, inputs); the latent-walk
    engine differentiates through `synthesis_apply` w.r.t. ws only;
  * convs run through ops.modulated_conv2d (input-scaling modulation —
    one shared-weight MXU conv per layer); the filtered leaky-ReLU is
    ops.filtered_lrelu (shift-add upfirdn2d + bias_act, XLA-fused);
  * `num_fp16_res` maps to bfloat16 per layer on TPU, as in SG2.

Architecture contract (public alias-free GAN design, NeurIPS 2021):
a Fourier-feature input plane with a learned per-sample similarity
transform, then `num_layers` modulated 1x1/3x3 convs each followed by
an upsample -> leaky-ReLU -> downsample chain running at a per-layer
temporary sampling rate, with Kaiser-designed low-pass filters whose
cutoffs interpolate geometrically from `first_cutoff` to the output
Nyquist over the non-critically-sampled layers. The mapping network is
the SG2 one (2 layers by default here).

There is no per-pixel noise in this family: synthesis_apply accepts
and ignores noise_mode/rng so SG2/SG3 share every call site.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import modulated_conv2d
from ...ops.filtered_lrelu import filtered_lrelu
from ...utils.util_easydict import EasyDict
from ..stylegan2.networks import _fc_init, fc_apply, mapping_init, mapping_apply  # noqa: F401 (mapping_* re-exported: SG3 uses the SG2 mapping contract)
from .filters import design_lowpass_filter


# ----------------------------------------------------------------------------
# Config: the per-layer sampling-rate plan

def generator_config(z_dim=512, c_dim=0, w_dim=512, img_resolution=256,
                     img_channels=2, channel_base=32768, channel_max=512,
                     num_mapping_layers=2, mapping_lr_multiplier=0.01,
                     embed_features=None, num_layers=14, num_critical=2,
                     first_cutoff=2.0, first_stopband=2 ** 2.1,
                     last_stopband_rel=2 ** 0.3, margin_size=10,
                     output_scale=0.25, num_fp16_res=4, conv_clamp=256,
                     conv_kernel=3, filter_size=6, lrelu_upsampling=2,
                     use_radial_filters=False):
    """Alias-free generator config. For the rotation-equivariant ('-r')
    variant pass conv_kernel=1, use_radial_filters=True and double
    channel_base/channel_max; the default is the translation-equivariant
    ('-t') variant. Mapping depth defaults to 2 (vs SG2's 8)."""
    if embed_features is None:
        embed_features = w_dim if c_dim > 0 else 0
    cfg = EasyDict(arch='stylegan3', z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                   img_resolution=img_resolution, img_channels=img_channels,
                   channel_base=channel_base, channel_max=channel_max,
                   num_mapping_layers=num_mapping_layers,
                   mapping_lr_multiplier=mapping_lr_multiplier,
                   embed_features=embed_features, num_layers=num_layers,
                   num_critical=num_critical, first_cutoff=first_cutoff,
                   first_stopband=first_stopband,
                   last_stopband_rel=last_stopband_rel,
                   margin_size=margin_size, output_scale=output_scale,
                   num_fp16_res=num_fp16_res, conv_clamp=conv_clamp,
                   conv_kernel=conv_kernel, filter_size=filter_size,
                   lrelu_upsampling=lrelu_upsampling,
                   use_radial_filters=use_radial_filters)
    assert num_layers > num_critical >= 0

    # Geometric interpolation of band parameters over the trunk; the last
    # `num_critical` layers run critically sampled at the output rate.
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(
        np.arange(num_layers + 1) / (num_layers - num_critical), 1.0)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(
        np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = (sampling_rates + margin_size * 2).astype(np.int64)
    sizes[-2:] = img_resolution  # no margin once critically sampled at full res
    channels = np.rint(np.minimum(
        (channel_base / 2) / cutoffs, channel_max)).astype(np.int64)
    channels[-1] = img_channels

    layers = []
    for idx in range(num_layers + 1):
        prev = max(idx - 1, 0)
        is_torgb = idx == num_layers
        is_critically_sampled = idx >= num_layers - num_critical
        # NOTE: no per-layer fp16 flag is stored in the plan. num_fp16_res
        # is a RUNTIME knob (engine.load_stylegan overwrites it post-load;
        # ingested checkpoints arrive with 0), so synthesis_apply derives
        # each layer's bf16 from the live cfg.num_fp16_res — a plan-baked
        # flag could silently diverge from it (advisor round 4).
        in_sr, out_sr = float(sampling_rates[prev]), float(sampling_rates[idx])
        k = 1 if is_torgb else conv_kernel
        tmp_sr = max(in_sr, out_sr) * (1 if is_torgb else lrelu_upsampling)
        up = int(round(tmp_sr / in_sr))
        down = int(round(tmp_sr / out_sr))
        up_taps = filter_size * up if up > 1 and not is_torgb else 1
        down_taps = filter_size * down if down > 1 and not is_torgb else 1
        in_size, out_size = int(sizes[prev]), int(sizes[idx])
        # Padding on the tmp-rate grid so the down stage lands exactly on
        # out_size, with the symmetric (half-up-step) phase convention.
        pad_total = (out_size - 1) * down + 1
        pad_total -= (in_size + k - 1) * up  # full conv output, upsampled
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up) // 2
        pad_hi = pad_total - pad_lo
        layers.append(EasyDict(
            name=f'L{idx}_{out_size}_{int(channels[idx])}',
            is_torgb=is_torgb, is_critically_sampled=is_critically_sampled,
            in_channels=int(channels[prev]), out_channels=int(channels[idx]),
            in_size=in_size, out_size=out_size,
            in_sampling_rate=in_sr, out_sampling_rate=out_sr,
            tmp_sampling_rate=tmp_sr,
            in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
            in_half_width=float(half_widths[prev]),
            out_half_width=float(half_widths[idx]),
            conv_kernel=k, up_factor=up, down_factor=down,
            up_taps=up_taps, down_taps=down_taps,
            down_radial=bool(use_radial_filters and not is_critically_sampled),
            padding=(int(pad_lo), int(pad_hi)),
        ))
    cfg.layers = layers
    cfg.input = EasyDict(channels=int(channels[0]), size=int(sizes[0]),
                         sampling_rate=float(sampling_rates[0]),
                         bandwidth=float(cutoffs[0]))
    cfg.num_ws = num_layers + 2  # input transform + each layer incl. toRGB
    return cfg


def _layer_filters(layer):
    """Design a layer's up/down FIR taps (numpy; None = identity)."""
    fu = design_lowpass_filter(
        layer.up_taps, cutoff=layer.in_cutoff, width=layer.in_half_width * 2,
        fs=layer.tmp_sampling_rate)
    fd = design_lowpass_filter(
        layer.down_taps, cutoff=layer.out_cutoff,
        width=layer.out_half_width * 2, fs=layer.tmp_sampling_rate,
        radial=layer.down_radial)
    return fu, fd


# ----------------------------------------------------------------------------
# Fourier-feature input plane

def input_init(key, cfg):
    """Params/buffers of the synthesis input (torch names: synthesis.input.*).

    freqs: random directions with magnitudes concentrated inside the
    input bandwidth; phases uniform in [-0.5, 0.5); affine predicts a
    (cos, sin, tx, ty) similarity transform from w[0] and initializes to
    the identity (zero weight, bias [1,0,0,0]); `transform` is the
    user-controllable global 3x3 (drives the EQ-T/EQ-R tests)."""
    ic = cfg.input
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = jax.random.normal(k1, (ic.channels, 2), dtype=jnp.float32)
    radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
    freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
    freqs = freqs * ic.bandwidth
    phases = jax.random.uniform(k2, (ic.channels,), dtype=jnp.float32) - 0.5
    affine = {
        'weight': jnp.zeros((4, cfg.w_dim), dtype=jnp.float32),
        'bias': jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32),
    }
    return {
        'weight': jax.random.normal(k3, (ic.channels, ic.channels),
                                    dtype=jnp.float32),
        'affine': affine,
        'transform': jnp.eye(3, dtype=jnp.float32),
        'freqs': freqs,
        'phases': phases,
    }


def input_apply(p, cfg, w, transform=None):
    """w [N, w_dim] -> feature plane [N, C0, size, size].

    A similarity transform acts on the continuous signal through the
    sinusoids' frequencies/phases only — this is what makes the whole
    network equivariant: sin(2pi(f·(Tx) + phi)) = sin(2pi((fT)·x + phi')).
    `transform` overrides the stored global 3x3 (row-vector convention:
    [[c, -s, tx], [s, c, ty], [0, 0, 1]] translates features by
    (-tx, -ty) signal units)."""
    ic = cfg.input
    n = w.shape[0]
    base = p['transform'] if transform is None else jnp.asarray(
        transform, jnp.float32)
    t = fc_apply(p['affine'], w.astype(jnp.float32))  # [N, 4] (c, s, tx, ty)
    t = t / jnp.sqrt(jnp.sum(jnp.square(t[:, :2]), axis=1, keepdims=True))
    m_r = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
    m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
    m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
    m_t = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
    m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
    transforms = m_r @ m_t @ base[None]  # user/global transform applied first

    phases = p['phases'][None] + jnp.einsum(
        'cd,nd->nc', p['freqs'], transforms[:, :2, 2])
    freqs = jnp.einsum('cd,nde->nce', p['freqs'], transforms[:, :2, :2])

    # Dampen features whose transformed frequency leaves the input band.
    amplitudes = jnp.clip(
        1 - (jnp.linalg.norm(freqs, axis=2) - ic.bandwidth)
        / (ic.sampling_rate / 2 - ic.bandwidth), 0.0, 1.0)

    # Pixel-center sampling grid of the input canvas (margin included).
    coords = (jnp.arange(ic.size, dtype=jnp.float32)
              + 0.5 - ic.size / 2) / ic.sampling_rate
    arg = (freqs[:, :, 0][:, None, None, :] * coords[None, None, :, None]
           + freqs[:, :, 1][:, None, None, :] * coords[None, :, None, None]
           + phases[:, None, None, :])
    x = jnp.sin(arg * (2 * np.pi)) * amplitudes[:, None, None, :]
    weight = p['weight'] * (1.0 / np.sqrt(ic.channels))
    x = jnp.einsum('nhwc,oc->nohw', x, weight)
    return x


# ----------------------------------------------------------------------------
# Synthesis layers

def _layer_init(key, cfg, layer):
    k1, k2 = jax.random.split(key)
    fu, fd = _layer_filters(layer)
    p = {
        'affine': _fc_init(k1, cfg.w_dim, layer.in_channels, bias_init=1.0),
        'weight': jax.random.normal(
            k2, (layer.out_channels, layer.in_channels,
                 layer.conv_kernel, layer.conv_kernel), dtype=jnp.float32),
        'bias': jnp.zeros((layer.out_channels,), dtype=jnp.float32),
        'magnitude_ema': jnp.ones((), dtype=jnp.float32),
    }
    if fu is not None:
        p['up_filter'] = jnp.asarray(fu)
    if fd is not None:
        p['down_filter'] = jnp.asarray(fd)
    return p


def layer_apply(p, cfg, layer, x, w, dtype=jnp.float32):
    """One alias-free layer: modulated full conv at the input rate, then
    filtered lrelu (up -> bias+lrelu(+clamp) -> down) onto the output grid.

    The input is pre-scaled by rsqrt(magnitude_ema) — the training-time
    EMA of the input's mean square (a buffer, not trained; see
    layer_magnitude for the update used by a future SG3 trainer)."""
    styles = fc_apply(p['affine'], w.astype(jnp.float32))
    if layer.is_torgb:
        styles = styles * float(
            1.0 / np.sqrt(layer.in_channels * layer.conv_kernel ** 2))
    # Input scaling commutes with the conv; apply it to x (scalar).
    gain_in = jax.lax.rsqrt(p['magnitude_ema'].astype(jnp.float32))
    x = x.astype(dtype) * gain_in.astype(dtype)
    x = modulated_conv2d(x, p['weight'].astype(dtype), styles,
                         padding=layer.conv_kernel - 1,
                         demodulate=not layer.is_torgb, flip_weight=True)
    # toRGB: identity nonlinearity (slope 1, gain 1), clamp still applies.
    gain = 1.0 if layer.is_torgb else float(np.sqrt(2.0))
    slope = 1.0 if layer.is_torgb else 0.2
    pad_lo, pad_hi = layer.padding
    x = filtered_lrelu(x, fu=p.get('up_filter'), fd=p.get('down_filter'),
                       b=p['bias'].astype(x.dtype),
                       up=layer.up_factor, down=layer.down_factor,
                       padding=[pad_lo, pad_hi, pad_lo, pad_hi],
                       gain=gain, slope=slope, clamp=cfg.conv_clamp)
    assert x.shape[2] == layer.out_size and x.shape[3] == layer.out_size
    return x


def layer_magnitude(x):
    """Mean-square input magnitude a trainer would EMA into magnitude_ema."""
    return jnp.mean(jnp.square(x.astype(jnp.float32)))


# ----------------------------------------------------------------------------
# Synthesis network

def synthesis_init(key, cfg):
    p = {'input': input_init(jax.random.fold_in(key, 0), cfg)}
    for i, layer in enumerate(cfg.layers):
        p[layer.name] = _layer_init(jax.random.fold_in(key, i + 1), cfg, layer)
    return p


def synthesis_apply(params, cfg, ws, noise_mode='const', rng=None,
                    remat=False, transform=None):
    """ws [N, num_ws, w_dim] -> image [N, img_channels, res, res].

    noise_mode/rng are accepted for SG2 call-site compatibility and
    ignored (the alias-free family has no per-pixel noise). remat may be
    bool (checkpoint every layer) or an int (checkpoint layers whose
    out_size >= that). `transform` overrides the stored global input
    transform (EQ-T/EQ-R probes, video rendering)."""
    del noise_mode, rng
    assert ws.shape[1] == cfg.num_ws, (ws.shape, cfg.num_ws)

    def want_remat(out_size):
        if isinstance(remat, bool):
            return remat
        return out_size >= int(remat)

    # Derive per-layer bf16 from the LIVE cfg.num_fp16_res, not the
    # layer.use_fp16 baked at plan time: num_fp16_res is a runtime knob
    # (engine.load_stylegan sets it post-load; SG3 ingestion stores 0),
    # and SG2 likewise derives its fp16 blocks at apply time. Formula as
    # the plan's: bf16 once the sampling rate is within num_fp16_res
    # doublings of the output resolution.
    n16 = int(cfg.num_fp16_res)
    x = input_apply(params['input'], cfg, ws[:, 0], transform=transform)
    for i, layer in enumerate(cfg.layers):
        lf16 = n16 > 0 and (layer.out_sampling_rate * (2 ** n16)
                            > cfg.img_resolution)
        dtype = jnp.bfloat16 if lf16 else jnp.float32

        def fn(p, x, w, layer=layer, dtype=dtype):
            return layer_apply(p, cfg, layer, x, w, dtype=dtype)

        if want_remat(layer.out_size):
            fn = jax.checkpoint(fn)
        x = fn(params[layer.name], x, ws[:, i + 1])
    x = x.astype(jnp.float32)
    if cfg.output_scale != 1.0:
        x = x * float(cfg.output_scale)
    return x


# ----------------------------------------------------------------------------
# Generator facade (mapping is the SG2 one — same pickle contract)

def generator_init(key, cfg):
    k1, k2 = jax.random.split(key)
    return {'mapping': mapping_init(k1, cfg), 'synthesis': synthesis_init(k2, cfg)}


def generator_apply(params, cfg, z, c=None, truncation_psi=1.0,
                    noise_mode='const', rng=None, transform=None):
    ws = mapping_apply(params['mapping'], cfg, z, c,
                       truncation_psi=truncation_psi)
    return synthesis_apply(params['synthesis'], cfg, ws,
                           noise_mode=noise_mode, rng=rng, transform=transform)
