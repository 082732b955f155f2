"""Pad -> upsample -> FIR filter -> downsample for batches of 2D images.

Parity: reference models/stylegan3/torch_utils/ops/upfirdn2d.py (CUDA
kernel + torch ref). TPU-native design: zero-insertion upsampling is a
reshape+pad, pad/crop is jnp.pad + slicing, the FIR filter is
shift-and-add slice arithmetic on the VPU (`_fir_axis`), and the
downsample is a strided slice — all fused by XLA, with the backward
derived automatically (the reference needed a hand-chained
backward-as-forward autograd pair, upfirdn2d.py:217-275).

Depthwise (`feature_group_count=C`) or lhs-dilated convs are
deliberately NOT used: on the current TPU toolchain their gradients
cost ~400-550 s of compile time and up to 20x runtime vs dense convs
(measured; see BENCH_NOTES.md).

`impl='ref'` is a literal translation of the op definition (using
depthwise convs, fine on CPU) kept for parity tests; `impl='xla'`
(default) is the fast path.
"""


import jax
import jax.numpy as jnp
from jax import lax
import numpy as np


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return padx0, padx1, pady0, pady1


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a 2D FIR filter for upfirdn2d (normalize / flip / gain).

    Returns a float32 jnp array: [fh, fw] (non-separable) or [taps]
    (separable). Mirrors reference setup_filter (upfirdn2d.py:70-114).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f.copy(), dtype=jnp.float32)


def separable_factor(f2d):
    """1-D taps `a` such that f2d == outer(a, a), or None.

    The SG2 resample filter is outer([1,3,3,1],[1,3,3,1])/16 — rank-1 and
    symmetric — but checkpoints store the 2-D buffer. Running the FIR
    separably halves the shift-add work (8 slice-mults vs 16), so
    converters factor incoming 2-D filters on host with this. Host-side
    numpy only (needs concrete values — never call under jit)."""
    f = np.asarray(f2d, np.float64)
    if f.ndim == 1:
        return f.astype(np.float32)
    if f.ndim != 2 or f.shape[0] != f.shape[1]:
        return None
    u, s, vt = np.linalg.svd(f)
    if s[0] <= 0 or (len(s) > 1 and s[1:].max() > 1e-6 * s[0]):
        return None  # not rank-1
    a = u[:, 0] * np.sqrt(s[0])
    b = vt[0] * np.sqrt(s[0])
    if a.sum() < 0:
        a, b = -a, -b
    if not np.allclose(a, b, atol=1e-9):
        return None  # rank-1 but asymmetric: outer(a,b), a != b
    return a.astype(np.float32)


# Pallas selection for the hot 'auto' path. GSPMD cannot partition a
# pallas_call, so the engine disables this when running over a device mesh
# (set_allow_pallas_blur(False)); single-chip TPU keeps it on.
_ALLOW_PALLAS_BLUR = True


def set_allow_pallas_blur(allow):
    global _ALLOW_PALLAS_BLUR
    _ALLOW_PALLAS_BLUR = bool(allow)


def _auto_wants_pallas(f, up, down, x=None):
    """The measured Pallas win is the up=down=1 padded separable blur
    (13 ms vs 177 ms XLA shift-add at [32,128,256,256] bf16 — see
    BENCH_NOTES.md round 2). Up/down-sampling shapes lose to XLA
    (round-1 measurement), and narrow widths waste VMEM (Mosaic pads the
    lane dim to 128, so a 9-wide block inflates 14x), so auto only
    diverts wide blurs."""
    if not _ALLOW_PALLAS_BLUR:
        return False
    if f is None or f.ndim != 1:
        return False
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    if (upx, upy, downx, downy) != (1, 1, 1, 1):
        return False
    if x is not None and int(x.shape[-1]) < 128:
        return False
    import jax

    return jax.default_backend() == 'tpu'


# Matmul-FIR auto selection. Two measured regimes (BENCH_NOTES.md):
#   * NARROW taps (SG2's 4-tap blurs): probed round 3, 3-11% SLOWER than
#     shift-add at every width gate — stays off.
#   * WIDE taps (the alias-free family's 12-24-tap Kaiser filters on big
#     upsampled canvases): probed round 4, 3.9x FASTER (SG3-T 256²
#     synthesis 2440 -> 624 ms/batch) — the shift-add chain is HBM
#     bandwidth-bound at ~T passes over multi-GB tensors, while the band
#     matrix rides the MXU at compute speed.
# Default: auto-divert separable FIRs with >= LATAUG_MATMUL_FIR_MINTAPS
# taps (8) on >= LATAUG_MATMUL_FIR_MINW (64) wide images.
# LATAUG_MATMUL_FIR=1 force-enables it for ALL tap counts (A-B knob).
import os as _os

_ALLOW_MATMUL_BLUR = _os.environ.get(
    "LATAUG_MATMUL_FIR", "").strip().lower() not in ("", "0", "false",
                                                     "off", "no")


def set_allow_matmul_blur(allow):
    global _ALLOW_MATMUL_BLUR
    _ALLOW_MATMUL_BLUR = bool(allow)


def _auto_wants_matmul(f, x):
    """Divert separable FIRs to the banded-matmul path (MXU).

    The band matrix is dense [len_in, len_out]; tiny images waste MXU
    tiles and the relative FLOP blow-up (len_in/taps per output) is
    amortized only when the contraction dim is large, so gate on W.
    Narrow filters (< min_taps) lose to shift-add (measured, round 3)
    unless force-enabled; wide filters win big (measured, round 4).
    Both measurements are MXU measurements: the default divert applies
    on the TPU backend only (on CPU the dense band pays the ~len/taps
    FLOP blow-up with no systolic array to hide it; the force knob
    still wins everywhere for parity tests)."""
    if f is None or f.ndim != 1:
        return False
    min_w = int(_os.environ.get("LATAUG_MATMUL_FIR_MINW", "64"))
    if x is None or int(x.shape[-1]) < min_w:
        return False
    if _ALLOW_MATMUL_BLUR:
        return True
    import jax

    if jax.default_backend() != 'tpu':
        return False
    min_taps = int(_os.environ.get("LATAUG_MATMUL_FIR_MINTAPS", "8"))
    return int(f.shape[0]) >= min_taps


def _axis_band_matrix(fk, n_in, n_out, up, down, pad0):
    """[n_in, n_out] band matrix M with y = x @ M == 1-axis upfirdn of x.

    y[j] = sum_k f[k] * xpad[j*down + k], where xpad is the zero-inserted
    (factor `up`, samples at positions idx*up + pad0) and padded/cropped
    signal — exactly `_fir_axis` ∘ pad ∘ zero-insert ∘ [::down] in one
    linear map: M = sum_k f[k] * B[k], with the 0/1 basis
    B[k, i, j] = [j*down + k - pad0 == i*up] (the multiples-of-`up` form
    subsumes the `p % up == 0 and p // up == i` membership test). All
    zeros contribute exact 0.0 products, so the matmul reduction equals
    the t-term shift-add up to reordering of the nonzero terms (±1 ulp)
    — parity-safe by construction.

    The basis is built IN-GRAPH from broadcasted iota comparisons, not
    as a trace-time numpy constant: a [t, n_in, n_out] f32 constant is
    1-4 MB per distinct geometry and G+D+grad sum to tens of MB — enough
    to trip the relay's request-body limit (HTTP 413, CLAUDE.md). Iotas
    carry no payload; the server-side compiler folds them for free.
    Contracting the (possibly traced) taps into the basis keeps the op
    differentiable w.r.t. the filter and jit-safe."""
    t = int(fk.shape[0])
    shape = (t, n_in, n_out)
    k = lax.broadcasted_iota(jnp.int32, shape, 0)
    i = lax.broadcasted_iota(jnp.int32, shape, 1)
    j = lax.broadcasted_iota(jnp.int32, shape, 2)
    basis = (j * down + k - pad0 == i * up).astype(jnp.float32)
    return jnp.tensordot(fk, basis, 1)


def _upfirdn2d_matmul(x, f, up, down, padding, flip_filter, gain):
    """Separable upfirdn as two banded dense contractions on the MXU.

    TPU-native reformulation: per axis, bake zero-insert + pad/crop +
    FIR + decimation into ONE [len_in, len_out] band matrix and contract
    it with jnp.einsum — a large batched matmul the MXU executes at
    compute speed-of-light, replacing the bandwidth-bound VPU shift-add
    chains. The gradient is the transposed contraction (dy @ M^T): no
    lhs_dilation, no depthwise conv, no strided-slice relayouts anywhere
    (the toolchain pathologies documented in this module's header).

    Returns None for non-separable or identity filters (caller falls
    back to the shift-add path).
    """
    if f is None or f.ndim != 1:
        return None
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    t = int(f.shape[0])

    n, c, h_in, w_in = (int(s) for s in x.shape)
    lw = w_in * upx + padx0 + padx1
    lh = h_in * upy + pady0 + pady1
    w_out = (lw - t) // downx + 1
    h_out = (lh - t) // downy + 1
    assert w_out > 0 and h_out > 0

    # Same tap prep as _prep_filter, in traced ops (f may be a jit arg).
    fk = f.astype(jnp.float32) * (float(gain) ** 0.5)
    if not flip_filter:
        fk = jnp.flip(fk, axis=0)

    # TPU MXU takes bf16 inputs with f32 accumulation natively; the CPU
    # dot thunk (tests) does not support mixed bf16->f32, so upcast there.
    mm_dtype = x.dtype if jax.default_backend() == 'tpu' else jnp.float32
    mw = _axis_band_matrix(fk, w_in, w_out, upx, downx, padx0).astype(mm_dtype)
    mh = _axis_band_matrix(fk, h_in, h_out, upy, downy, pady0).astype(mm_dtype)
    # W then H; f32 accumulation on the MXU, output in the input dtype
    # (matches the shift-add path's dtype contract).
    y = jnp.einsum('nchw,wj->nchj', x.astype(mm_dtype), mw,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum('nchw,hj->ncjw', y.astype(mm_dtype), mh,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1,
              impl='auto'):
    """Apply the upsample/pad/FIR/downsample pipeline to NCHW `x`.

    Args match the reference op (upfirdn2d.py:118-162): `padding` is
    [x0, x1, y0, y1] w.r.t. the upsampled image (negative = crop),
    flip_filter False = convolution / True = correlation, `gain` scales
    the output magnitude. impl: 'auto' (default: Pallas blur kernel for
    the up=down=1 separable case on single-chip TPU, XLA otherwise),
    'xla' (shift-add), 'matmul' (banded MXU contraction per axis),
    'pallas' (fused kernel, custom VJP), or 'ref'.
    """
    assert x.ndim == 4
    if impl == 'ref':
        return _upfirdn2d_ref(x, f, up, down, padding, flip_filter, gain)
    if impl == 'matmul' or (impl == 'auto' and _auto_wants_matmul(f, x)):
        y = _upfirdn2d_matmul(x, f, up, down, padding, flip_filter, gain)
        if y is not None:
            return y
        # non-separable / identity filters fall through to shift-add
    if impl == 'pallas' or (impl == 'auto'
                            and _auto_wants_pallas(f, up, down, x)):
        return _upfirdn2d_pallas_op(x, f, up, down, padding, flip_filter, gain)
    return _upfirdn2d_xla(x, f, up, down, padding, flip_filter, gain)


def _prep_filter(f, gain, flip_filter, dtype):
    """Apply gain, flip convention. Returns (f, is_separable)."""
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    f = f * (gain ** (f.ndim / 2))
    # lax conv performs correlation; the op's default is convolution.
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    return f.astype(dtype), f.ndim == 1


def _depthwise_conv(x, ker_hw, channels, strides=(1, 1), padding=((0, 0), (0, 0)),
                    lhs_dilation=(1, 1)):
    """Per-channel 2D conv in NCHW with kernel [kh, kw] shared across channels."""
    w = jnp.tile(ker_hw[None, None, :, :], (channels, 1, 1, 1))  # [C,1,kh,kw]
    return lax.conv_general_dilated(
        x, w,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=channels,
    )


def _upsample_zero_insert(x, upx, upy):
    """Zero-insertion upsample of NCHW x (trailing zeros included)."""
    if upx == 1 and upy == 1:
        return x
    b, c, h, w = x.shape
    x = x.reshape(b, c, h, 1, w, 1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1)))
    return x.reshape(b, c, h * upy, w * upx)


def _pad_crop(x, padx0, padx1, pady0, pady1):
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (max(pady0, 0), max(pady1, 0)),
                    (max(padx0, 0), max(padx1, 0))))
    return x[:, :,
             max(-pady0, 0): x.shape[2] - max(-pady1, 0),
             max(-padx0, 0): x.shape[3] - max(-padx1, 0)]


def _fir_axis(x, taps, axis):
    """1-D FIR along `axis` (valid mode) as shift-and-add slice arithmetic.

    A depthwise (feature_group_count=C) conv gradient is pathologically
    slow on the TPU toolchain — ~500 s compile and ~20x runtime vs a
    dense conv (measured; see ops docstring). The FIR filters here are
    tiny (4 taps for StyleGAN2), so T scaled static slices on the VPU
    compile instantly, fuse with neighbors, and differentiate as the
    same slice-add pattern.
    """
    t = int(taps.shape[0])
    size = x.shape[axis] - t + 1
    acc = None
    for i in range(t):
        sl = lax.slice_in_dim(x, i, i + size, axis=axis)
        term = sl * taps[i]
        acc = term if acc is None else acc + term
    return acc


def _fir2d(x, f):
    """2-D FIR (valid mode) via row-of-taps slice arithmetic."""
    fh, fw = int(f.shape[0]), int(f.shape[1])
    out_h = x.shape[2] - fh + 1
    out_w = x.shape[3] - fw + 1
    acc = None
    for i in range(fh):
        for j in range(fw):
            sl = x[:, :, i:i + out_h, j:j + out_w]
            term = sl * f[i, j]
            acc = term if acc is None else acc + term
    return acc


def _upfirdn2d_xla(x, f, up, down, padding, flip_filter, gain):
    """Fast path: zero-insert + pad + shift-add FIR + strided slice.

    All stages are data movement / VPU multiply-adds that XLA fuses;
    no grouped convs anywhere (see _fir_axis for why that matters).
    """
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    f, separable = _prep_filter(f, gain, flip_filter, x.dtype)

    x = _upsample_zero_insert(x, upx, upy)
    x = _pad_crop(x, padx0, padx1, pady0, pady1)

    if separable:
        x = _fir_axis(x, f, axis=3)
        x = _fir_axis(x, f, axis=2)
    elif f.shape[0] == 1 or f.shape[1] == 1:
        x = _fir_axis(x, f.reshape(-1), axis=3 if f.shape[0] == 1 else 2)
    else:
        x = _fir2d(x, f)

    return x[:, :, ::downy, ::downx]


def _upfirdn2d_ref(x, f, up, down, padding, flip_filter, gain):
    """Literal translation of the op definition (upfirdn2d.py:167-212)."""
    batch, channels, in_h, in_w = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    up_w = in_w * upx + padx0 + padx1
    up_h = in_h * upy + pady0 + pady1
    fw, fh = _get_filter_size(f)
    assert up_w >= fw and up_h >= fh

    # Upsample by zero insertion.
    x = x.reshape(batch, channels, in_h, 1, in_w, 1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1)))
    x = x.reshape(batch, channels, in_h * upy, in_w * upx)

    # Pad or crop.
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (max(pady0, 0), max(pady1, 0)),
                    (max(padx0, 0), max(padx1, 0))))
    x = x[:, :,
          max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]

    f, separable = _prep_filter(f, gain, flip_filter, x.dtype)
    if separable:
        taps = f.shape[0]
        x = _depthwise_conv(x, f.reshape(1, taps), channels)
        x = _depthwise_conv(x, f.reshape(taps, 1), channels)
    else:
        x = _depthwise_conv(x, f, channels)

    # Downsample by throwing away pixels.
    x = x[:, :, ::downy, ::downx]
    return x


# ----------------------------------------------------------------------------
# Convenience wrappers (parity: upfirdn2d.py:277-388).

def filter2d(x, f, padding=0, flip_filter=False, gain=1, impl='xla'):
    """FIR-filter images; output padded to match input shape by default."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1, impl='xla'):
    """Upsample images by `up` with FIR smoothing (output gain up^2)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy, impl=impl)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1, impl='xla'):
    """Downsample images by `down` with FIR anti-aliasing."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain, impl=impl)


# ----------------------------------------------------------------------------
# Pallas fused kernel: the whole up/pad/FIR/down pipeline in one VMEM
# residency per channel tile (the XLA path round-trips HBM once per FIR
# axis). Separable filters only; backward implemented with the
# backward-as-forward parameter transform of the reference
# (upfirdn2d.py:252-268) so gradients reuse the same kernel.

import functools as _functools


def _upfirdn2d_pallas_call(x3, f, up, down, padding, flip_filter, gain):
    """x3: [M, H, W] (batch*channels flattened). Static params.

    Zero-insertion upsampling happens OUTSIDE the kernel (Mosaic cannot
    lower the interleaving reshape); pad + both FIR axes + downsample
    run fused in one VMEM residency.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if upx > 1 or upy > 1:
        m0, h0, w0 = x3.shape
        x4 = x3.reshape(m0, h0, 1, w0, 1)
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1)))
        x3 = x4.reshape(m0, h0 * upy, w0 * upx)
        upx = upy = 1

    m, in_h, in_w = x3.shape
    up_h = in_h * upy + pady0 + pady1
    up_w = in_w * upx + padx0 + padx1
    taps = int(f.shape[0])
    out_h = -(-(up_h - taps + 1) // downy)
    out_w = -(-(up_w - taps + 1) // downx)

    # Prepare the tap vector outside (traced-safe); the kernel reads the
    # scalars from SMEM.
    fk = (f.astype(jnp.float32) * (float(gain) ** 0.5))
    if not flip_filter:
        fk = fk[::-1]

    # Channel-tile size bounded by VMEM. Mosaic double-buffers the in/out
    # blocks and keeps several fp32 intermediates live (zero-inserted,
    # padded, per-axis FIR outputs), so budget conservatively — and with
    # the LANE-PADDED footprint: the last dim rounds up to 128 lanes, the
    # second-to-last to 8 sublanes (a 9x9 block occupies 16x128!).
    def padded(h_, w_):
        return (-(-h_ // 8) * 8) * (-(-w_ // 128) * 128)

    bytes_per_ch = (3 * padded(up_h, up_w) + padded(out_h, up_w)
                    + 2 * padded(in_h, in_w) + 2 * padded(out_h, out_w)) * 4
    bc = max(1, min(m, (10 << 20) // max(bytes_per_ch, 1)))
    while m % bc != 0:
        bc -= 1

    def kernel(f_ref, x_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)
        # Pad / crop.
        x = jnp.pad(x, ((0, 0),
                        (max(pady0, 0), max(pady1, 0)),
                        (max(padx0, 0), max(padx1, 0))))
        x = x[:, max(-pady0, 0): x.shape[1] - max(-pady1, 0),
              max(-padx0, 0): x.shape[2] - max(-padx1, 0)]
        # FIR along W then H (shift-and-add, all in VMEM).
        size_w = x.shape[2] - taps + 1
        acc = None
        for i in range(taps):
            term = x[:, :, i:i + size_w] * f_ref[i]
            acc = term if acc is None else acc + term
        x = acc
        size_h = x.shape[1] - taps + 1
        acc = None
        for i in range(taps):
            term = x[:, i:i + size_h, :] * f_ref[i]
            acc = term if acc is None else acc + term
        x = acc
        o_ref[:] = x[:, ::downy, ::downx].astype(o_ref.dtype)

    interpret = jax.default_backend() != 'tpu'
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, out_h, out_w), x3.dtype),
        grid=(m // bc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, out_h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fk, x3)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _upfirdn2d_pallas_op(x, f, up, down, padding, flip_filter, gain):
    assert f is not None and f.ndim == 1, \
        "pallas impl supports separable (1-D) filters"
    n, c, h, w = x.shape
    y = _upfirdn2d_pallas_call(x.reshape(n * c, h, w), f, up, down, padding,
                               flip_filter, gain)
    return y.reshape(n, c, y.shape[1], y.shape[2])


def _upfirdn2d_pallas_fwd(x, f, up, down, padding, flip_filter, gain):
    y = _upfirdn2d_pallas_op(x, f, up, down, padding, flip_filter, gain)
    # x is saved ONLY for the filter cotangent; when f is not
    # differentiated (every product path — filters are buffers) the df
    # computation below is dead code XLA removes, and x's liveness does
    # not extend into the backward pass.
    return y, (f, x, y.shape)


def _upfirdn2d_pallas_bwd(up, down, padding, flip_filter, gain, res, dy):
    """Backward-as-forward (parity: reference upfirdn2d.py:252-268)."""
    f, x, y_shape = res
    x_shape = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw = fh = int(f.shape[0])
    _, _, ih, iw = x_shape
    _, _, oh, ow = y_shape
    p = [
        fw - padx0 - 1,
        iw * upx - ow * downx + padx0 - upx + 1,
        fh - pady0 - 1,
        ih * upy - oh * downy + pady0 - upy + 1,
    ]
    dx = _upfirdn2d_pallas_op(dy, f, (downx, downy), (upx, upy), p,
                              not flip_filter, gain)
    # True filter cotangent via the autodiff of the XLA path (round-3
    # review: returning None here silently zeroed grads w.r.t. f where
    # impl='xla' returns the real gradient). Dead-code-eliminated
    # whenever f is not differentiated — the product paths.
    _, vjp_f = jax.vjp(
        lambda ff: _upfirdn2d_xla(x, ff, up, down, padding, flip_filter,
                                  gain), f)
    df, = vjp_f(dy)
    return dx, df


_upfirdn2d_pallas_op.defvjp(_upfirdn2d_pallas_fwd, _upfirdn2d_pallas_bwd)
