"""Fused bias + activation + gain + clamp.

Parity: reference models/stylegan3/torch_utils/ops/bias_act.py — the same
nine activation kinds with their default gains (activation table at
bias_act.py:21-31). On TPU the elementwise chain is fused by XLA into the
surrounding matmul/conv, so the 'ref' jnp path *is* the fast path; a
Pallas kernel ('fused') is provided for the standalone case and for
parity testing of the kernel toolchain.

Gradients come from JAX autodiff — the reference's hand-written
first/second-order CUDA grad kernels collapse into jax.grad.
"""

import functools

import jax
import jax.numpy as jnp

from ..utils.util_easydict import EasyDict

# Activation table. `def_gain` is the default output gain used by the
# StyleGAN networks (sqrt(2) for the rectifiers), matching the reference
# `activation_funcs` dict (bias_act.py:21-31).
#
# def_gain must be a Python float, NOT a jnp value: module scope runs at
# import time, and creating a jnp array there initializes the default JAX
# backend before callers (tests, the driver's dryrun) get a chance to
# force the CPU platform — which kills import entirely when the remote
# TPU backend is unreachable (round-1 MULTICHIP failure).
_SQRT2 = 1.4142135623730951

activation_funcs = {
    'linear':   EasyDict(func=lambda x: x,                                  def_alpha=0.0, def_gain=1.0),
    'relu':     EasyDict(func=lambda x: jax.nn.relu(x),                     def_alpha=0.0, def_gain=_SQRT2),
    'lrelu':    EasyDict(func=lambda x, alpha: jax.nn.leaky_relu(x, alpha), def_alpha=0.2, def_gain=_SQRT2),
    'tanh':     EasyDict(func=lambda x: jnp.tanh(x),                        def_alpha=0.0, def_gain=1.0),
    'sigmoid':  EasyDict(func=lambda x: jax.nn.sigmoid(x),                  def_alpha=0.0, def_gain=1.0),
    'elu':      EasyDict(func=lambda x: jax.nn.elu(x),                      def_alpha=0.0, def_gain=1.0),
    'selu':     EasyDict(func=lambda x: jax.nn.selu(x),                     def_alpha=0.0, def_gain=1.0),
    'softplus': EasyDict(func=lambda x: jax.nn.softplus(x),                 def_alpha=0.0, def_gain=1.0),
    'swish':    EasyDict(func=lambda x: jax.nn.swish(x),                    def_alpha=0.0, def_gain=_SQRT2),
}


def bias_act(x, b=None, dim=1, act='linear', alpha=None, gain=None, clamp=None,
             impl='ref'):
    """y = clamp(gain * act(x + reshape(b)), ±clamp).

    Args:
      x: input of any shape.
      b: optional bias of shape [x.shape[dim]].
      dim: dimension of x that the bias broadcasts along.
      act: activation name from `activation_funcs`.
      alpha: activation shape parameter (lrelu slope); None -> default.
      gain: output scale; None -> activation's default gain.
      clamp: clamp output to [-clamp, +clamp] if >= 0.
      impl: 'ref' (jnp, XLA-fused) or 'fused' (Pallas kernel).
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    assert clamp is None or clamp >= 0 or clamp == -1.0

    if impl == 'fused' and x.ndim >= 2:
        return _bias_act_pallas(x, b, dim, act, alpha, gain, clamp)
    return _bias_act_ref(x, b, dim, act, alpha, gain, clamp)


def _apply_act(x, act, alpha):
    spec = activation_funcs[act]
    if act == 'lrelu':
        return spec.func(x, alpha)
    return spec.func(x)


def _bias_act_ref(x, b, dim, act, alpha, gain, clamp):
    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = _apply_act(x, act, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


# ----------------------------------------------------------------------------
# Pallas fused kernel. One VMEM-resident elementwise pass; the grid tiles the
# flattened (rows, cols) view so arbitrary shapes map onto (8,128) lanes.

@functools.partial(jax.jit, static_argnames=('dim', 'act', 'alpha', 'gain', 'clamp'))
def _bias_act_pallas(x, b, dim, act, alpha, gain, clamp):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    # Move the bias axis last, flatten everything else in front of it, so the
    # kernel sees a 2-D [rows, channels] problem with a per-column bias.
    perm = [i for i in range(x.ndim) if i != dim] + [dim]
    xt = jnp.transpose(x, perm)
    import math
    rows = math.prod(xt.shape[:-1]) if xt.ndim > 1 else 1
    cols = xt.shape[-1]
    x2 = xt.reshape(rows, cols)
    bias = b if b is not None else jnp.zeros((cols,), x.dtype)
    bias2 = bias.reshape(1, cols).astype(x2.dtype)

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:]
        v = _apply_act(v, act, alpha)
        if gain != 1.0:
            v = v * jnp.asarray(gain, v.dtype)
        if clamp >= 0:
            v = jnp.clip(v, -clamp, clamp)
        o_ref[:] = v

    block_rows = min(rows, 512) if rows > 0 else 1
    grid = (pl.cdiv(rows, block_rows),)
    # Pallas TPU kernels only compile on TPU; interpret elsewhere (tests).
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, bias2)

    out = out.reshape(xt.shape)
    inv_perm = [perm.index(i) for i in range(len(perm))]
    return jnp.transpose(out, inv_perm).reshape(orig_shape)
