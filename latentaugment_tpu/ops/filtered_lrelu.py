"""Filtered leaky-ReLU (StyleGAN3 op).

Parity: reference torch_utils/ops/filtered_lrelu.py — upsample with an
FIR filter, add bias, leaky-ReLU with gain and optional clamp, then
downsample with a second FIR filter. The SG2 path of LatentAugment
never calls this op (SURVEY.md §2.5 item 3); it is provided via the
decomposed formulation (the reference's own Python fallback,
filtered_lrelu.py:121-155) built on our shift-add upfirdn2d + bias_act,
which XLA fuses. The CUDA sign-buffer machinery is a memory trick for
the backward; JAX autodiff handles it.
"""

import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import _get_filter_size, _parse_padding, upfirdn2d


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=None, slope=0.2, clamp=None, flip_filter=False,
                   impl='auto'):
    """y = downsample(fd, clamp(lrelu(gain * upsample(fu, pad(x + b))))).

    Exactly the reference's decomposition (_filtered_lrelu_ref,
    filtered_lrelu.py:121-155): bias is applied BEFORE upsampling, the
    user `padding` (w.r.t. the upsampled image) is the ONLY padding on
    the up stage, and the down stage gets none — so
    out_w = (in_w*up + px0+px1 - (fu_w-1) - (fd_w-1) + (down-1)) // down.
    `gain` defaults to sqrt(2); `slope` is the lrelu negative slope;
    `clamp` the symmetric output clamp.
    """
    assert x.ndim == 4
    fu_w, fu_h = _get_filter_size(fu)
    fd_w, fd_h = _get_filter_size(fd)
    px0, px1, py0, py1 = _parse_padding(padding)
    if gain is None:
        gain = float(jnp.sqrt(2.0))
    batch, channels, in_h, in_w = x.shape
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1)
             + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1)
             + (down - 1)) // down

    x = bias_act(x, b)  # bias only, before upsampling (ref :147)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter, impl=impl)
    x = bias_act(x, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter, impl=impl)
    assert x.shape == (batch, channels, out_h, out_w)
    return x
