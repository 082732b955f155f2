"""Style-modulated convolution (the StyleGAN2 workhorse).

The reference receives this op inside the pickled network source
(persistence-embedded `training.networks_stylegan2.modulated_conv2d`; see
SURVEY.md §1 note) — it modulates the conv weight per sample with a style
vector, demodulates by the resulting per-output-channel norm, and
convolves via conv2d_resample.

TPU-native design: default to the *input-scaling* formulation
(`fused_modconv=False` in NVIDIA terms): scale the input by the style,
run ONE shared-weight convolution for the whole batch (large MXU matmul,
no per-sample weights), and scale the output by the demodulation
coefficients computed in closed form:

    dcoef[n, o] = rsqrt( sum_{i,k} (w[o,i,k] * s[n,i])^2 + eps )
               = rsqrt( (s^2 @ Wsq^T)[n, o] + eps ),  Wsq[o,i] = sum_k w[o,i,k]^2

which is a [N,I]x[I,O] matmul instead of materializing [N,O,I,kh,kw].
The grouped per-sample path (`fused_modconv=True`) exists for parity
testing but maps poorly onto the MXU.
"""

import jax.numpy as jnp
from jax import lax

from .conv2d_resample import conv2d_resample


def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True,
                     fused_modconv=False, eps=1e-8):
    """Args:
      x: [N, I, H, W] input.
      weight: [O, I, kh, kw] shared conv weight.
      styles: [N, I] per-sample modulation.
      noise: optional additive noise broadcastable to the output.
      up/down/padding/resample_filter/flip_weight: as conv2d_resample.
      demodulate: apply weight demodulation (True except toRGB layers).
      fused_modconv: use per-sample grouped weights (parity path only).
    Returns [N, O, H', W'].
    """
    batch_size = x.shape[0]
    out_channels, in_channels, kh, kw = [int(s) for s in weight.shape]
    assert styles.shape == (batch_size, in_channels)

    # Pre-normalize to avoid overflow in reduced precision (mirrors the
    # reference's fp16 pre-scaling; harmless in fp32).
    if demodulate and x.dtype == jnp.float16:
        weight = weight * (1.0 / jnp.sqrt(in_channels * kh * kw)
                           / jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    if demodulate:
        w_sq = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(2, 3))  # [O, I]
        dcoefs = lax.rsqrt(
            jnp.square(styles.astype(jnp.float32)) @ w_sq.T + eps)  # [N, O]

    if not fused_modconv:
        x = x * styles.astype(x.dtype)[:, :, None, None]
        x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                            down=down, padding=padding, flip_weight=flip_weight)
        if demodulate and noise is not None:
            x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
        elif demodulate:
            x = x * dcoefs.astype(x.dtype)[:, :, None, None]
        elif noise is not None:
            x = x + noise.astype(x.dtype)
        return x

    # Parity path: per-sample weights via grouped conv (batch folded into
    # the channel dim, feature_group_count = N).
    w = weight[None] * styles[:, None, :, None, None]  # [N, O, I, kh, kw]
    if demodulate:
        w = w * dcoefs[:, :, None, None, None]
    w = w.astype(x.dtype).reshape(batch_size * out_channels, in_channels, kh, kw)
    x = x.reshape(1, batch_size * in_channels, *x.shape[2:])
    x = conv2d_resample(x, w, f=resample_filter, up=up, down=down,
                        padding=padding, groups=batch_size, flip_weight=flip_weight)
    x = x.reshape(batch_size, out_channels, *x.shape[2:])
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x
