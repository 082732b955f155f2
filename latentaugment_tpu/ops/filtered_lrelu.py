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
                   impl='xla'):
    """y = downsample(fd, clamp(lrelu(bias(upsample(fu, pad(x)))))).

    Args mirror the reference op (filtered_lrelu.py:56-108): `padding`
    is w.r.t. the upsampled image, `gain` defaults to sqrt(2) scaled
    into the upsample, `slope` the lrelu negative slope, `clamp` the
    symmetric output clamp.
    """
    assert x.ndim == 4
    fu_w, fu_h = _get_filter_size(fu)
    fd_w, fd_h = _get_filter_size(fd)
    px0, px1, py0, py1 = _parse_padding(padding)
    if gain is None:
        gain = float(jnp.sqrt(2.0))

    # Upsample: pad to center the filter footprint like upsample2d.
    p_up = [
        px0 + (fu_w + up - 1) // 2,
        px1 + (fu_w - up) // 2,
        py0 + (fu_h + up - 1) // 2,
        py1 + (fu_h - up) // 2,
    ]
    x = upfirdn2d(x, fu, up=up, padding=p_up, gain=up ** 2,
                  flip_filter=flip_filter, impl=impl)
    x = bias_act(x, b, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    p_down = [
        (fd_w - down + 1) // 2,
        (fd_w - down) // 2,
        (fd_h - down + 1) // 2,
        (fd_h - down) // 2,
    ]
    x = upfirdn2d(x, fd, down=down, padding=p_down, gain=1.0,
                  flip_filter=flip_filter, impl=impl)
    return x
