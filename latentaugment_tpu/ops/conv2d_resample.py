"""2D convolution with optional up/downsampling (fused resampling algebra).

Parity: reference models/stylegan3/torch_utils/ops/conv2d_resample.py:46-141
— the same padding algebra and fast-path ordering (1x1 special cases,
strided down-conv, transpose-strided up-conv, plain conv, generic
fallback). The torch conv2d/conv_transpose2d + custom-gradfix machinery
collapses into `lax.conv_general_dilated`, whose transposed form is
expressed with `lhs_dilation` and whose gradients XLA derives natively.

All tensors NCHW, weights OIHW ([out, in//groups, kh, kw]).
"""

import jax.numpy as jnp
from jax import lax

from .upfirdn2d import _get_filter_size, _parse_padding, upfirdn2d


def _conv2d_wrapper(x, w, stride=1, padding=(0, 0), groups=1, transpose=False,
                    flip_weight=True):
    """Mirror of the reference `_conv2d_wrapper` (conv2d_resample.py:29-41).

    flip_weight=True means cross-correlation (the torch conv2d convention);
    False flips the kernel spatially first (true convolution). For
    `transpose=True` the weight is expected in torch conv_transpose layout
    `[in, out//groups, kh, kw]`.

    NOTE: transposed convolution is expressed as explicit zero-insertion
    followed by a PLAIN dense conv. `lhs_dilation` is deliberately never
    emitted: on the current TPU toolchain a differentiated lhs-dilated
    conv costs ~400 s of compile time (measured; strided and plain convs
    compile in ~2 s).
    """
    kh, kw = int(w.shape[-2]), int(w.shape[-1])
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    py, px = padding
    sy, sx = stride

    if not flip_weight and (kw > 1 or kh > 1):
        w = jnp.flip(w, axis=(-2, -1))

    if not transpose:
        return lax.conv_general_dilated(
            x, w,
            window_strides=stride,
            padding=((py, py), (px, px)),
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            feature_group_count=groups,
        )

    # conv_transpose2d(x, w[I, O//g], stride=s, padding=p) == correlation of
    # the zero-inserted input (s-1 zeros between samples), padded by k-1-p,
    # with the weight transposed to OIHW and spatially flipped.
    in_ch, out_pg = int(w.shape[0]), int(w.shape[1])
    w = w.reshape(groups, in_ch // groups, out_pg, kh, kw)
    w = jnp.transpose(w, (0, 2, 1, 3, 4))
    w = w.reshape(groups * out_pg, in_ch // groups, kh, kw)
    w = jnp.flip(w, axis=(-2, -1))

    if sy > 1 or sx > 1:
        return _transpose_conv_subpixel(x, w, (sy, sx), (py, px), groups)
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((kh - 1 - py, kh - 1 - py), (kw - 1 - px, kw - 1 - px)),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=groups,
    )


def _transpose_conv_subpixel(x, w, stride, padding, groups):
    """Stride-s transposed conv via the sub-pixel decomposition.

    Computing over a zero-inserted input wastes (s^2-1)/s^2 of the MACs
    (the MXU multiplies the inserted zeros). Instead, each output parity
    class (r_y, r_x) is an ordinary stride-1 correlation of the ORIGINAL
    input with the sub-kernel w[s_r::s] at an offset — s^2 dense convs at
    input resolution, interleaved — exactly 1/s^2 the MACs, all of them
    useful. Derivation: with q = k-1-p, the zero-inserted correlation is
    y[s*j + r] = sum_a w[s*a + s_r] x[j + a + off_r], where
    s_r = (q - r) mod s and off_r = (r + s_r - q) / s.

    `w` here is already in OIHW layout with the conv_transpose transforms
    (transposed + spatially flipped) applied.
    """
    sy, sx = stride
    py, px = padding
    n, c, in_h, in_w = x.shape
    kh, kw = int(w.shape[-2]), int(w.shape[-1])
    qy, qx = kh - 1 - py, kw - 1 - px
    out_h = sy * (in_h - 1) + kh - 2 * py
    out_w = sx * (in_w - 1) + kw - 2 * px
    assert out_h > 0 and out_w > 0

    def parity_params(r, s, q, k, n_in, l_total):
        s_r = (q - r) % s
        off = (r + s_r - q) // s
        k_r = len(range(s_r, k, s))
        l_r = (l_total - r + s - 1) // s  # count of m in [0, L) with m % s == r
        pad_lo = -off
        pad_hi = l_r - (n_in + pad_lo - k_r + 1)
        return s_r, k_r, l_r, pad_lo, pad_hi

    rows = []
    for ry in range(sy):
        s_ry, k_ry, l_ry, pl_y, ph_y = parity_params(ry, sy, qy, kh, in_h, out_h)
        cols = []
        for rx in range(sx):
            s_rx, k_rx, l_rx, pl_x, ph_x = parity_params(rx, sx, qx, kw, in_w,
                                                         out_w)
            # A parity class with no output positions (l <= 0, tiny
            # outputs) or no kernel taps (k_r == 0, kernel smaller than
            # the stride) contributes nothing: emit zeros via the scatter
            # path instead of a zero-size conv (which XLA rejects).
            if l_ry <= 0 or l_rx <= 0 or k_ry == 0 or k_rx == 0:
                cols.append(None)
                continue
            sub_w = w[:, :, s_ry::sy, s_rx::sx]
            y = lax.conv_general_dilated(
                x, sub_w,
                window_strides=(1, 1),
                padding=((pl_y, ph_y), (pl_x, ph_x)),
                dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                feature_group_count=groups,
            )
            cols.append(y)
        rows.append(cols)

    # Interleave the parity outputs back to full resolution. When every
    # parity class has equal length (out dims divisible by stride — the
    # SG2 case) a stack+reshape does it with pure data movement; otherwise
    # fall back to strided scatter. out_c/dtype come from the weights, not
    # rows[0][0], which is None for zero-contribution parity classes.
    out_c = w.shape[0]
    out_dtype = jnp.result_type(x.dtype, w.dtype)
    if out_h % sy == 0 and out_w % sx == 0 and \
            all(y is not None and y.shape[2] == out_h // sy
                and y.shape[3] == out_w // sx for r in rows for y in r):
        stacked = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
        # [sy, sx, n, c, H/sy, W/sx] -> [n, c, H/sy, sy, W/sx, sx]
        stacked = jnp.transpose(stacked, (2, 3, 4, 0, 5, 1))
        return stacked.reshape(n, out_c, out_h, out_w)
    out = jnp.zeros((n, out_c, out_h, out_w), out_dtype)
    for ry in range(sy):
        for rx in range(sx):
            y = rows[ry][rx]
            if y is None:
                continue
            out = out.at[:, :, ry::sy, rx::sx].set(y)
    return out


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """2D convolution with optional FIR-filtered up/downsampling.

    Args (parity with reference conv2d_resample.py:46-75):
      x: [N, C_in, H, W].
      w: [C_out, C_in//groups, kh, kw].
      f: low-pass FIR filter from setup_filter(), or None.
      up/down: integer resampling factors.
      padding: int / [x, y] / [x0, x1, y0, y1], w.r.t. the upsampled image.
      groups: grouped conv count.
      flip_weight: False = convolution, True = correlation.
      flip_filter: same convention for the FIR filter.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    out_channels, in_channels_per_group, kh, kw = [int(s) for s in w.shape]
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling.
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Fast path: 1x1 conv with downsampling only => downsample first.
    if kw == 1 and kh == 1 and (down > 1 and up == 1):
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d_wrapper(x, w, groups=groups, flip_weight=flip_weight)

    # Fast path: 1x1 conv with upsampling only => convolve first.
    if kw == 1 and kh == 1 and (up > 1 and down == 1):
        x = _conv2d_wrapper(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                         flip_filter=flip_filter)

    # Fast path: downsampling only => strided convolution.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d_wrapper(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Fast path: upsampling (optional downsampling) => transpose strided conv.
    if up > 1:
        if groups == 1:
            wt = jnp.transpose(w, (1, 0, 2, 3))
        else:
            wt = w.reshape(groups, out_channels // groups, in_channels_per_group, kh, kw)
            wt = jnp.transpose(wt, (0, 2, 1, 3, 4))
            wt = wt.reshape(groups * in_channels_per_group, out_channels // groups, kh, kw)
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        x = _conv2d_wrapper(x, wt, stride=up, padding=(pyt, pxt), groups=groups,
                            transpose=True, flip_weight=(not flip_weight))
        x = upfirdn2d(x, f, padding=[px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt],
                      gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Fast path: no resampling, symmetric non-negative padding => plain conv.
    if up == 1 and down == 1:
        if px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
            return _conv2d_wrapper(x, w, padding=(py0, px0), groups=groups,
                                   flip_weight=flip_weight)

    # Fallback: generic path.
    x = upfirdn2d(x, (f if up > 1 else None), up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = _conv2d_wrapper(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
