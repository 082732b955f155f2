"""Filtered leaky-ReLU (StyleGAN3 op).

Parity: reference torch_utils/ops/filtered_lrelu.py — upsample with an
FIR filter, add bias, leaky-ReLU with gain and optional clamp, then
downsample with a second FIR filter. Two implementations:

  * decomposed (default): the reference's own Python fallback
    (filtered_lrelu.py:121-155) built on our upfirdn2d + bias_act —
    each FIR rides the banded-matmul MXU path on TPU, XLA fuses the
    elementwise. The CUDA sign-buffer machinery (filtered_lrelu.cu,
    1284 LoC) is a memory trick for the backward; JAX autodiff handles
    it.
  * impl='pallas_fused': the whole op in ONE Pallas kernel — bias add,
    both up-FIR axes, lrelu, both down-FIR axes as four banded 2-D
    matmuls (MXU) over a channel tile resident in VMEM, so the up-rate
    canvas (4x the pixels of the input) never round-trips HBM. This is
    the TPU analogue of the reference's fused CUDA kernel. Measured on
    a v5e (scripts/probe_flrelu.py, BENCH_NOTES round 5): up to 7.8x
    on the wide-tap small-canvas trunk layers, SLOWER once the VMEM
    budget forces tiny channel tiles (big canvases). The auto gate —
    DEFAULT ON, TPU-backend-only, kill switch LATAUG_FUSED_FLRELU=0 /
    set_fused_flrelu(False) — engages it only where the tile stays
    >= _FUSED_MIN_TILE channels; net: SG3 256² synthesis +25%, SG3
    walk +9% (measured). Differentiable: a custom VJP runs the kernel
    forward and the decomposed formulation's VJP backward.
"""

import functools as _functools
import os as _os

import jax
import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import (_axis_band_matrix, _get_filter_size,
                        _parse_padding, upfirdn2d)

_ALLOW_FUSED = None  # None -> env LATAUG_FUSED_FLRELU decides
_FUSED_MIN_TILE = 8  # measured crossover: bc<8 => decomposed wins


def set_fused_flrelu(allow):
    """Program-wide override of the fused-kernel auto gate (None = env)."""
    global _ALLOW_FUSED
    _ALLOW_FUSED = allow


def _fused_enabled():
    """DEFAULT ON (TPU-backend check is at the call site): measured wins
    on v5e with the win-regime gate — SG3 256² synthesis 51.2 -> 64.1
    imgs/s (+25%), SG3 b16 walk 1.62 -> 1.77 samples/s (+9%), BENCH_NOTES
    round 5. LATAUG_FUSED_FLRELU=0 / set_fused_flrelu(False) is the
    kill switch (matmul-FIR gate precedent)."""
    if _ALLOW_FUSED is not None:
        return bool(_ALLOW_FUSED)
    return _os.environ.get("LATAUG_FUSED_FLRELU", "").strip().lower() \
        not in ("0", "false", "off", "no")


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

    impl: 'auto' (decomposed; diverts to the fused Pallas kernel on TPU
    when the gate is on and the geometry is in its measured win regime),
    'pallas_fused' (force the fused kernel, no win-regime gate), or an
    upfirdn2d impl name for the decomposed path's FIRs.
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

    force = impl == 'pallas_fused'
    auto_fuse = (impl == 'auto' and _fused_enabled()
                 and jax.default_backend() == 'tpu')
    fused_declined = False
    if force or auto_fuse:
        geo = _fused_geometry(x.shape, fu, fd, up, down,
                              (px0, px1, py0, py1),
                              require_win_regime=not force)
        if geo is not None:
            if b is None:
                b = jnp.zeros((channels,), x.dtype)
            y = _fused_op(x, fu, fd, b,
                          up, down, (px0, px1, py0, py1), float(gain),
                          float(slope),
                          float(clamp) if clamp is not None else None,
                          bool(flip_filter))
            assert y.shape == (batch, channels, out_h, out_w)
            return y
        fused_declined = auto_fuse
        if force:
            impl = 'auto'  # non-separable filters: fall through

    # H-striped path (opt-in, LATAUG_STRIPED_FLRELU=1): covers exactly
    # the layers the fused kernel's win-regime gate declines (big
    # canvases), trading ~taps/strip recompute for never materializing
    # the up-rate canvas — incl. in the backward (per-strip remat).
    if impl == 'striped' or (fused_declined and _striped_enabled()):
        y = _filtered_lrelu_striped(x, fu, fd, b, up, down,
                                    (px0, px1, py0, py1), gain, slope,
                                    clamp, flip_filter)
        if y is not None:
            assert y.shape == (batch, channels, out_h, out_w)
            return y
        if impl == 'striped':
            impl = 'auto'

    x = bias_act(x, b)  # bias only, before upsampling (ref :147)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter, impl=impl)
    x = bias_act(x, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter, impl=impl)
    assert x.shape == (batch, channels, out_h, out_w)
    return x


def _fused_geometry(x_shape, fu, fd, up, down, padding,
                    require_win_regime):
    """Static plan for the fused kernel, or None to use decomposed.

    None when a filter is non-separable, or (win-regime gate) when the
    VMEM budget would force a channel tile under _FUSED_MIN_TILE —
    measured crossover on v5e: bc>=8 layers win up to 7.8x, bc<8
    layers lose (BENCH_NOTES round 5)."""
    if (fu is not None and fu.ndim != 1) or \
            (fd is not None and fd.ndim != 1):
        return None
    px0, px1, py0, py1 = padding
    n, c, in_h, in_w = (int(s) for s in x_shape)
    tu = int(fu.shape[0]) if fu is not None else 1
    td = int(fd.shape[0]) if fd is not None else 1
    up_w = in_w * up + px0 + px1 - (tu - 1)
    up_h = in_h * up + py0 + py1 - (tu - 1)
    out_w = (up_w - td) // down + 1
    out_h = (up_h - td) // down + 1
    if min(up_w, up_h, out_w, out_h) <= 0:
        return None

    def padded(h_, w_):
        return (-(-h_ // 8) * 8) * (-(-w_ // 128) * 128)

    per_ch = (2 * padded(in_h, in_w) + padded(in_h, up_w)
              + 3 * padded(up_h, up_w) + padded(up_h, out_w)
              + 2 * padded(out_h, out_w)) * 4
    bands = (padded(in_w, up_w) + padded(in_h, up_h)
             + padded(up_w, out_w) + padded(up_h, out_h)) * 4
    m = n * c
    bc = max(1, min(m, ((10 << 20) - bands) // max(per_ch, 1)))
    while m % bc != 0:
        bc -= 1
    if require_win_regime and bc < _FUSED_MIN_TILE:
        return None
    return dict(bc=bc, tu=tu, td=td, up_w=up_w, up_h=up_h,
                out_w=out_w, out_h=out_h)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _fused_op(x, fu, fd, b, up, down, padding, gain, slope, clamp,
              flip_filter):
    """Differentiable fused filtered_lrelu: Pallas kernel forward, the
    decomposed formulation's VJP backward (numerically identical ops —
    same band-matrix construction — so grads match the default path)."""
    return _filtered_lrelu_fused(x, fu, fd, b, up, down, padding, gain,
                                 slope, clamp, flip_filter)


def _decomposed(x, fu, fd, b, up, down, padding, gain, slope, clamp,
                flip_filter):
    px0, px1, py0, py1 = padding
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    return upfirdn2d(x, fd, down=down, flip_filter=flip_filter)


def _fused_fwd(x, fu, fd, b, up, down, padding, gain, slope, clamp,
               flip_filter):
    y = _fused_op(x, fu, fd, b, up, down, padding, gain, slope, clamp,
                  flip_filter)
    return y, (x, fu, fd, b)


def _fused_bwd(up, down, padding, gain, slope, clamp, flip_filter, res,
               dy):
    x, fu, fd, b = res
    _, vjp = jax.vjp(
        lambda x_, fu_, fd_, b_: _decomposed(
            x_, fu_, fd_, b_, up, down, padding, gain, slope, clamp,
            flip_filter), x, fu, fd, b)
    return vjp(dy)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def _striped_enabled():
    return _os.environ.get("LATAUG_STRIPED_FLRELU", "").strip().lower() \
        not in ("", "0", "false", "off", "no")


def _filtered_lrelu_striped(x, fu, fd, b, up, down, padding, gain, slope,
                            clamp, flip_filter, strip_rows=None,
                            remat=True):
    """H-striped banded-matmul filtered_lrelu (pure XLA, differentiable).

    The big-canvas alias-free layers are where (a) the fused Pallas
    kernel loses (VMEM collapses the channel tile) and (b) the b32 walk
    compile-OOMs (a single up-rate canvas is ~8.7 GB — BENCH_NOTES
    round 5). This path computes the output in horizontal strips of
    `strip_rows` output rows: each strip slices only the input-row
    window that influences it and contracts strip sub-blocks of the
    SAME band matrices as the matmul/fused paths, so the full up-rate
    canvas is never materialized. With remat=True every strip is
    jax.checkpoint'ed — the BACKWARD holds the full input plus ONE
    strip's internals instead of the whole canvas, which is the b32
    memory unlock. Uniform strip shapes via the overlap-at-the-end
    trick (last strip recomputes a few rows; overlapping writes carry
    identical values).

    Returns None when inapplicable (non-separable taps, or the image is
    too small for the window algebra) — caller falls back."""
    from jax import lax

    if (fu is not None and fu.ndim != 1) or \
            (fd is not None and fd.ndim != 1):
        return None
    px0, px1, py0, py1 = padding
    n, c, in_h, in_w = (int(s) for s in x.shape)
    tu = int(fu.shape[0]) if fu is not None else 1
    td = int(fd.shape[0]) if fd is not None else 1
    up_w = in_w * up + px0 + px1 - (tu - 1)
    up_h = in_h * up + py0 + py1 - (tu - 1)
    out_w = (up_w - td) // down + 1
    out_h = (up_h - td) // down + 1
    if min(up_w, up_h, out_w, out_h) <= 0:
        return None
    if strip_rows is None:
        strip_rows = int(_os.environ.get("LATAUG_STRIPED_ROWS", "64"))
    r_rows = min(int(strip_rows), out_h)
    lj = (r_rows - 1) * down + td          # up-rows feeding one strip
    li = (lj + tu - 2) // up + 2           # input rows feeding those
    if lj > up_h or li > in_h or r_rows <= 0:
        return None  # image smaller than one strip window: use decomposed

    mwu = _band(fu, tu, in_w, up_w, up, 1, px0, up * up, flip_filter)
    mhu = _band(fu, tu, in_h, up_h, up, 1, py0, up * up, flip_filter)
    mwd = _band(fd, td, up_w, out_w, 1, down, 0, 1, flip_filter)
    mhd = _band(fd, td, up_h, out_h, 1, down, 0, 1, flip_filter)
    # Same dtype contract as _upfirdn2d_matmul: bf16 inputs with f32
    # accumulation on the MXU; the CPU dot thunk can't mix bf16->f32,
    # so only bf16 upcasts there (f32/f64 stay native — an f64 test
    # must not silently round through f32).
    mm_dtype = (jnp.float32 if (jax.default_backend() != 'tpu'
                                and x.dtype == jnp.bfloat16) else x.dtype)
    acc = jnp.promote_types(mm_dtype, jnp.float32)  # f32 accum; f64 stays f64
    mwu, mhu = mwu.astype(mm_dtype), mhu.astype(mm_dtype)
    mwd, mhd = mwd.astype(mm_dtype), mhd.astype(mm_dtype)

    xb = x if b is None else x + b.astype(x.dtype)[None, :, None, None]
    xb = xb.astype(mm_dtype)
    slope_f, gain_f = float(slope), float(gain)
    clamp_v = float(clamp) if clamp is not None else None

    n_strips = -(-out_h // r_rows)
    r0s = jnp.asarray([min(s * r_rows, out_h - r_rows)
                       for s in range(n_strips)], jnp.int32)

    def strip(r0):
        j0 = r0 * down
        i0 = jnp.clip((j0 - py0) // up, 0, in_h - li)
        xs = lax.dynamic_slice_in_dim(xb, i0, li, axis=2)
        mhu_s = lax.dynamic_slice(mhu, (i0, j0), (li, lj))
        mhd_s = lax.dynamic_slice(mhd, (j0, r0), (lj, r_rows))
        a = jnp.einsum('nchw,wj->nchj', xs, mwu,
                       preferred_element_type=acc)
        a = jnp.einsum('nchw,hj->ncjw', a.astype(mm_dtype), mhu_s,
                       preferred_element_type=acc)
        a = jnp.where(a >= 0, a, a * slope_f) * gain_f
        if clamp_v is not None:
            a = jnp.clip(a, -clamp_v, clamp_v)
        d = jnp.einsum('nchw,wj->nchj', a.astype(mm_dtype), mwd,
                       preferred_element_type=acc)
        d = jnp.einsum('nchw,hj->ncjw', d.astype(mm_dtype), mhd_s,
                       preferred_element_type=acc)
        return d.astype(x.dtype)

    fn = jax.checkpoint(strip) if remat else strip
    ys = lax.map(fn, r0s)  # [S, N, C, r_rows, W_out]

    out = jnp.zeros((n, c, out_h, out_w), x.dtype)

    def place(i, out):
        z = r0s[i].astype(r0s.dtype) * 0  # 0 in r0s' int dtype (x64-safe)
        return lax.dynamic_update_slice(out, ys[i], (z, z, r0s[i], z))

    return lax.fori_loop(0, n_strips, place, out)


def _band(f, taps, n_in, n_out, up, down, pad0, gain, flip_filter):
    """Per-axis band matrix with upfirdn2d's tap-prep convention."""
    if f is None:
        f = jnp.ones((1,), jnp.float32)
    fk = f.astype(jnp.float32) * (float(gain) ** 0.5)
    if not flip_filter:
        fk = jnp.flip(fk, axis=0)
    return _axis_band_matrix(fk, n_in, n_out, up, down, pad0)


def _filtered_lrelu_fused(x, fu, fd, b, up, down, padding, gain, slope,
                          clamp, flip_filter):
    """One-kernel filtered_lrelu: four banded matmuls + elementwise in a
    single VMEM residency per channel tile (see module docstring).

    Returns None when the filters are not separable (1-D taps) — the
    caller falls back to the decomposed path. Matches the decomposed
    form to float roundoff (same band-matrix construction as
    upfirdn2d's matmul path, which is shift-add-parity by
    construction)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ONE source of truth for the geometry/VMEM plan: the same helper
    # the auto gate consults (review round 5 — a retuned gate copy must
    # not diverge from what the kernel actually tiles with).
    geo = _fused_geometry(tuple(int(s) for s in x.shape), fu, fd, up,
                          down, padding, require_win_regime=False)
    if geo is None:
        return None
    px0, px1, py0, py1 = padding
    n, c, in_h, in_w = (int(s) for s in x.shape)
    tu, td = geo['tu'], geo['td']
    up_w, up_h = geo['up_w'], geo['up_h']
    out_w, out_h = geo['out_w'], geo['out_h']
    bc = geo['bc']
    m = n * c

    # Band matrices (iota-built outside the kernel; the 2-D up gain
    # up**2 splits as `up` per axis — upfirdn2d's convention).
    mwu = _band(fu, tu, in_w, up_w, up, 1, px0, up * up, flip_filter)
    mhu = _band(fu, tu, in_h, up_h, up, 1, py0, up * up, flip_filter)
    mwd = _band(fd, td, up_w, out_w, 1, down, 0, 1, flip_filter)
    mhd = _band(fd, td, up_h, out_h, 1, down, 0, 1, flip_filter)

    bias = (b if b is not None else jnp.zeros((c,), x.dtype))
    bias = bias.astype(jnp.float32)

    slope = float(slope)
    out_gain = float(gain)
    clamp_v = float(clamp) if clamp is not None else None

    def kernel(bias_ref, x_ref, mwu_ref, mhu_ref, mwd_ref, mhd_ref,
               o_ref):
        # bias arrives UNBLOCKED ([m, 1] whole-array in VMEM, ~32 KB)
        # and is sliced per grid step: a blocked (bc, 1) spec would
        # need bc % 8 == 0, which the VMEM-budgeted bc can't promise
        # (measured: the 148²/276² layers pick bc of 1-6).
        i = pl.program_id(0)
        bias_t = bias_ref[pl.ds(i * bc, bc), :]
        t = x_ref[:].astype(jnp.float32) + bias_t[:, :, None]
        # W up-FIR: [bc, H, W] @ [W, Wu] as one 2-D matmul.
        a = jax.lax.dot_general(
            t.reshape(bc * in_h, in_w), mwu_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bc, in_h, up_w)
        # H up-FIR: transpose H last, matmul, transpose back.
        a = a.transpose(0, 2, 1).reshape(bc * up_w, in_h)
        a = jax.lax.dot_general(
            a, mhu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = a.reshape(bc, up_w, up_h).transpose(0, 2, 1)
        # lrelu with gain and clamp on the tmp-rate canvas.
        a = jnp.where(a >= 0, a, a * slope) * out_gain
        if clamp_v is not None:
            a = jnp.clip(a, -clamp_v, clamp_v)
        # W down-FIR.
        d = jax.lax.dot_general(
            a.reshape(bc * up_h, up_w), mwd_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bc, up_h, out_w)
        # H down-FIR.
        d = d.transpose(0, 2, 1).reshape(bc * out_w, up_h)
        d = jax.lax.dot_general(
            d, mhd_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = d.reshape(bc, out_w, out_h).transpose(0, 2, 1) \
            .astype(o_ref.dtype)

    interpret = jax.default_backend() != 'tpu'
    x3 = x.reshape(m, in_h, in_w)
    bias_m = jnp.broadcast_to(bias[None, :], (n, c)).reshape(m, 1)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, out_h, out_w), x.dtype),
        grid=(m // bc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias: whole array
            pl.BlockSpec((bc, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_w, up_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_h, up_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((up_w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((up_h, out_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, out_h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bias_m, x3, mwu, mhu, mwd, mhd)
    return y.reshape(n, c, out_h, out_w)
